"""TPU probe: multi-ensemble aggregate throughput at the round-3 fast
config (sdirk3, decoupled grid, hmax=48). Honest timing per
docs/TPU_NOTES.md. Usage: python scripts/probe_r3_ens.py [hmax]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from probe_r2_perf import NAMES, TRUE, UC, build_eval


def main():
    from metrotrpl_tpu.inference.metropolis import build_mh_kernel, vmap_ensembles
    from metrotrpl_tpu.inference.moves import build_move_plan

    hmax = float(sys.argv[1]) if len(sys.argv) > 1 else 48.0
    refactor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print(f"device: {jax.devices()[0]} hmax={hmax:g} F={refactor}",
          flush=True)
    K = 8
    window = 100
    base_move = np.full(len(NAMES), 0.01)
    temps = 2.0 ** np.arange(K)

    _, states, _, plan = build_eval(K, "auto", None, hmax=hmax,
                                    align_outputs=False,
                                    refactor_every=refactor)
    param_info = {
        "names": NAMES, "unit_conversions": UC,
        "do_log": {n: 1 for n in NAMES}, "active": {n: 1 for n in NAMES},
        "init_guess": dict(TRUE),
        "prior_dist": {n: (1e-32, 1e32) for n in NAMES},
        "trial_move": {n: 0.01 for n in NAMES},
    }
    mp = build_move_plan(param_info, {"hard_bounds": 1})

    for E in (1, 2, 4, 8):
        try:
            # mirror run_mh_fused: block_b chosen for the E-fold fused batch
            kern = build_mh_kernel(
                plan, mp, temps, base_move, temper_freq=10,
                do_tempering=True, window=window, dtype=jnp.float32,
                backend="auto", block_b=None, batch_mult=E)
            if E > 1:
                kern = vmap_ensembles(kern)
                st = jnp.broadcast_to(states[None], (E,) + states.shape)
                keys = jax.random.split(jax.random.PRNGKey(0), E)
            else:
                st = states
                keys = jax.random.PRNGKey(0)
            ll = kern.init_ll(st)
            out = kern.run_window(st, ll, jnp.asarray(1), keys)
            jax.block_until_ready(out[0])
            st_r, ll_r = out[0], out[1]
            reps, k = 2, 1 + window
            t0 = time.perf_counter()
            for _ in range(reps):
                st_r, ll_r, _, _, _, _ = kern.run_window(
                    st_r, ll_r, jnp.asarray(k), keys)
                k += window
            jax.block_until_ready(st_r)
            dt = (time.perf_counter() - t0) / (reps * window)
            agg = E * K / dt
            print(f"E={E} (batch {E*K*6:4d}): {dt*1e3:8.3f} ms/iter  "
                  f"aggregate {agg:7.1f} walker-steps/s", flush=True)
        except Exception as e:
            print(f"E={E} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
