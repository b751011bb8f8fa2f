"""Ablate the MH iteration cost on TPU: where do the ~28 ms/iter go when
the solve itself (interp h16) takes ~2 ms?

Honest timing: chained inputs + readback per docs/TPU_NOTES.md.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from scripts.probe_r2_perf import NAMES, TRUE, build_eval  # reuse workload


def bench_scan(label, body, carry0, n_iters=100, reps=2):
    @jax.jit
    def run(carry):
        return jax.lax.scan(body, carry, jnp.arange(n_iters))[0]

    carry = run(carry0)
    carry = jax.tree.map(lambda x: x, carry)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = run(carry)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / (reps * n_iters)
    print(f"{label:42s} {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def main():
    from metrotrpl_tpu.inference.metropolis import build_mh_kernel
    from metrotrpl_tpu.inference.moves import build_move_plan, make_trial_move

    print(f"device: {jax.devices()[0]}", flush=True)
    K = 8
    ev, states, temps, plan = build_eval(
        K, "xla", 16, hmax=16.0, align_outputs=False)
    ev_fn = ev.__wrapped__ if hasattr(ev, "__wrapped__") else ev

    # A: eval-only scan
    def body_eval(states, k):
        ll = ev_fn(states, temps)["logll_T"]
        states = states * (1.0 + 1e-7 * jnp.tanh(ll[0, 0]))
        return states, None
    bench_scan("A eval-only", body_eval, states)

    # B: propose-only scan
    param_info = {
        "names": NAMES,
        "unit_conversions": {},
        "do_log": {n: 1 for n in NAMES},
        "active": {n: 1 for n in NAMES},
        "init_guess": dict(TRUE),
        "prior_dist": {n: (1e-32, 1e32) for n in NAMES},
        "trial_move": {n: 0.01 for n in NAMES},
    }
    mcmc_hb = {"hard_bounds": 1}
    mp = build_move_plan(param_info, mcmc_hb)
    widths = 0.01 * jnp.sqrt(jnp.asarray(temps))[:, None] * jnp.ones(
        (1, len(NAMES)), jnp.float32)

    def body_prop(carry, k):
        states, key = carry
        key = jax.random.fold_in(key, k)
        keys = jax.random.split(key, K)
        new = jax.vmap(lambda s, w, kk: make_trial_move(s, w, kk, mp))(
            states, widths, keys)
        return (new, key), None
    bench_scan("B propose-only (hard_bounds)", body_prop,
               (states, jax.random.PRNGKey(0)))

    mp0 = build_move_plan(param_info, {"hard_bounds": 0})

    def body_prop0(carry, k):
        states, key = carry
        key = jax.random.fold_in(key, k)
        keys = jax.random.split(key, K)
        new = jax.vmap(lambda s, w, kk: make_trial_move(s, w, kk, mp0))(
            states, widths, keys)
        return (new, key), None
    bench_scan("C propose-only (no retry)", body_prop0,
               (states, jax.random.PRNGKey(0)))

    # D/E/F: full kernels
    base_move = np.full(len(NAMES), 0.01)
    for label, kw in [
        ("D full kernel (temper+hard_bounds)",
         dict(do_tempering=True, mcmc=mcmc_hb)),
        ("E full kernel no tempering",
         dict(do_tempering=False, mcmc=mcmc_hb)),
        ("F full kernel no retry",
         dict(do_tempering=True, mcmc={"hard_bounds": 0})),
    ]:
        mp_x = build_move_plan(param_info, kw["mcmc"])
        kern = build_mh_kernel(plan, mp_x, np.asarray(temps), base_move,
                               temper_freq=10,
                               do_tempering=kw["do_tempering"], window=100,
                               dtype=jnp.float32)
        ll = kern.init_ll(states)
        out = kern.run_window(states, ll, jnp.asarray(1),
                              jax.random.PRNGKey(0))
        jax.block_until_ready(out[0])
        st, llt = out[0], out[1]
        t0 = time.perf_counter()
        reps = 2
        k = 101
        for _ in range(reps):
            st, llt, _, _, _, _ = kern.run_window(st, llt, jnp.asarray(k),
                                               jax.random.PRNGKey(0))
            k += 100
        jax.block_until_ready(st)
        dt = (time.perf_counter() - t0) / (reps * 100)
        print(f"{label:42s} {dt*1e3:8.3f} ms/iter "
              f"({K/dt:.0f} walker-steps/s)", flush=True)


if __name__ == "__main__":
    main()
