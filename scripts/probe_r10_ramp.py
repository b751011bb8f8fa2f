"""TPU probe: coarser geometric dt-ramp (h0, growth) sweep — item 8 of
VERDICT r3 ("attack the ramp").

Roofline context (docs/TPU_NOTES.md round-5): the kernel is
dependency-DEPTH-bound, and 50 of 86 per-solve steps are the geometric
early-time ramp (h0=1e-3 ns, growth=1.25). Unlike ramp_block (round-6,
rejected: stale-Jacobian accuracy collapse in f32), raising `growth`
keeps per-step refactorization and simply takes FEWER, FATTER ramp steps
— cutting the sequential chain itself. The round-8 Newton-divergence
predicate + escalation ladder is the safety net for states where the
coarser ramp diverges.

Per config this measures, on the chip:
  * n_ramp / n_steps (chain-depth saved),
  * |dll| vs the gold config (h4, refine 2, chord-free — known to match
    the f64 LSODA oracle pointwise, docs/LL_AGREEMENT_r05.md) at 32
    posterior-ball states (+/-0.15 dex) and 32 wide-ball states
    (+/-0.3 dex), same seeds across configs,
  * Newton-predicate flag rate at those states (escalate-free eval),
  * MH walk throughput and acceptance (inline-escalation kernel, truth
    +/-0.3 dex starts, bench workload geometry).

Usage: python scripts/probe_r10_ramp.py [window] [h0:growth ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from metrotrpl_tpu.inference.likelihood import (
    build_likelihood_plan,
    make_eval_logll,
)
from metrotrpl_tpu.inference.metropolis import build_mh_kernel
from metrotrpl_tpu.inference.moves import build_move_plan
from metrotrpl_tpu.workloads import (
    STAUB_NAMES as NAMES,
    STAUB_TRUE as TRUE,
    staub_param_info,
)
from scripts.probe_r4_window import synth_curves

N_CHAINS = 8
NT = 501
T_END = 2000.0


def _setup():
    lengths = [311.0, 2000.0, 311.0, 2000.0, 311.0, 2000.0]
    flu = np.loadtxt(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "Inputs", "staub_MAPI_threepower_twothick_fluences.csv"),
        delimiter=",")
    t = np.linspace(0, T_END, NT)
    vals = synth_curves(lengths, flu, t)
    param_info = staub_param_info(trial_move=0.01)
    sim_info = {"lengths": lengths, "nx": [128] * 6,
                "meas_types": ["TRPL"] * 6, "num_meas": 6}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": 1, "hard_bounds": 1}
    e_data = ([t] * 6, vals, [np.full(NT, 0.05)] * 6)
    return lengths, flu, t, param_info, sim_info, mcmc, e_data


def _ball_states(n, width, seed):
    rng = np.random.default_rng(seed)
    param_info = staub_param_info(trial_move=0.01)
    st = np.tile([TRUE[nm] for nm in NAMES], (n, 1))
    active = np.array([param_info["active"][nm] for nm in NAMES],
                      dtype=bool)
    shift = rng.uniform(-width, width, st.shape) * active[None, :]
    return st * 10.0 ** shift


def _eval_ll(plan, states, escalate):
    ev = jax.jit(make_eval_logll(plan, dtype=jnp.float32,
                                 escalate=escalate, backend="auto"))
    out = ev(jnp.asarray(states, jnp.float32), jnp.asarray([1.0]))
    return (np.asarray(out["logll_T"])[:, 0],
            np.asarray(out["fail_states"]))


def main():
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    combos = ([tuple(float(x) for x in a.split(":")) for a in sys.argv[2:]]
              or [(1e-3, 1.25), (1e-3, 1.5), (1e-3, 2.0),
                  (1e-2, 1.25), (1e-2, 1.5), (1e-2, 2.0)])

    (lengths, flu, t, param_info, sim_info, mcmc, e_data) = _setup()
    move_plan = build_move_plan(param_info, mcmc)
    temps = 2.0 ** np.arange(N_CHAINS)
    base_move = np.array(
        [param_info["trial_move"][n] if param_info["active"][n] else 0.0
         for n in NAMES])
    states0 = _ball_states(N_CHAINS, 0.3, 20260816)

    ball = np.concatenate([_ball_states(32, 0.15, 1),
                           _ball_states(32, 0.3, 2)])

    # gold reference ll (h4, refine 2, chord-free: the escalation-ladder
    # target, pointwise-matched to the f64 LSODA oracle)
    plan_gold = build_likelihood_plan(
        sim_info, param_info, mcmc, e_data, flu,
        hmax=4.0, align_outputs=False, scheme="sdirk3", refine=2,
        refactor_every=1, escalate=False)
    ll_gold, _ = _eval_ll(plan_gold, ball, "off")
    print(f"device: {jax.devices()[0]}; gold finite "
          f"{np.isfinite(ll_gold).sum()}/{len(ball)}", flush=True)

    for h0, growth in combos:
        plan = build_likelihood_plan(
            sim_info, param_info, mcmc, e_data, flu,
            hmax=48.0, align_outputs=False, scheme="sdirk3",
            refactor_every=4, h0=h0, growth=growth)
        fp = plan.fwd[0][1]

        # accuracy + flag rate at the same ball (inline = production
        # semantics for the ll; off = pre-repair flag rate)
        ll_f, _ = _eval_ll(plan, ball, "inline")
        _, flags = _eval_ll(plan, ball, "off")
        fin = np.isfinite(ll_f) & np.isfinite(ll_gold)
        dll = np.abs(ll_f - ll_gold)[fin]
        q = np.percentile(dll, [50, 99, 100]) if fin.any() else [np.nan] * 3

        # walk: inline kernel (cond overhead is config-independent)
        kernel = build_mh_kernel(
            plan, move_plan, temps, base_move, temper_freq=10,
            do_tempering=True, window=window, dtype=jnp.float32,
            backend="auto", escalate="inline")
        st = jnp.asarray(states0, jnp.float32)
        ll_T = jax.block_until_ready(kernel.init_ll(st))
        st, llt, *_ = kernel.run_window(st, ll_T, jnp.asarray(1),
                                        jax.random.PRNGKey(1))
        jax.block_until_ready(st)
        n_rep = 3
        k = 1 + window
        accepts = []
        t0 = time.perf_counter()
        for _ in range(n_rep):
            st, llt, _, _, _, hist = kernel.run_window(
                st, llt, jnp.asarray(k), jax.random.PRNGKey(0))
            accepts.append(np.asarray(hist[2]).mean())
            k += window
        jax.block_until_ready(st)
        dt = time.perf_counter() - t0
        sps = n_rep * window * N_CHAINS / dt
        print(f"h0={h0:g} g={growth:g}: n_ramp={fp.n_ramp} "
              f"n_steps={fp.n_steps}  {sps:7.1f} steps/s  "
              f"accept={np.mean(accepts):.3f}  "
              f"|dll| p50={q[0]:.3g} p99={q[1]:.3g} max={q[2]:.3g}  "
              f"flags={int((flags > 0).sum())}/{len(ball)}  "
              f"nonfin={int((~fin).sum())}", flush=True)


if __name__ == "__main__":
    main()
