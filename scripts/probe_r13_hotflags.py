"""TPU probe: WHY does the escalation cond still fire every iteration at
the bench workload after the round-10 gate?

Runs the bench staub walk (8 tempered chains, nx=128, h48/F4, sigma=1,
+/-0.3-dex starts) with the inline kernel for `n_win` windows, then
evaluates the final states with an escalate-free eval and dumps, per
(chain, measurement): resid, fit score, gate, static-fail, flag — and
which rows would fire the repair cond.

Usage: python scripts/probe_r13_hotflags.py [n_win] [window]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from metrotrpl_tpu.inference.likelihood import (
    ESCALATE_GATE_SCORE,
    NEWTON_DIV_TOL,
    make_eval_logll,
)
from metrotrpl_tpu.inference.metropolis import build_mh_kernel


def main():
    n_win = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    lengths, flu, t, pm = bench._workload()
    curves, _, _ = bench._oracle_curves(lengths, flu, t, pm)
    plan, move_plan, temps, base_move, states0 = bench._build_inference(
        lengths, flu, t, curves, hmax=48.0, align_outputs=False,
        scheme="sdirk3", refactor_every=4)

    kern = build_mh_kernel(
        plan, move_plan, temps, base_move, temper_freq=10,
        do_tempering=True, window=window, dtype=jnp.float32,
        backend="auto", escalate="inline")
    st = states0
    ll = jax.block_until_ready(kern.init_ll(st))
    k = 1
    for _ in range(n_win):
        st, ll, *_ = kern.run_window(st, ll, jnp.asarray(k),
                                     jax.random.PRNGKey(0))
        k += window
    jax.block_until_ready(st)

    # evaluate the WALKED states under fast-mode variants: does a mildly
    # smaller hmax avoid the chronic nx=128 collapse/flag entirely?
    from metrotrpl_tpu.inference.likelihood import build_likelihood_plan

    lengths_, flu_, t_, _ = bench._workload()
    import numpy as _np
    vals = [_np.log10(c) for c in curves]
    param_info = bench.staub_param_info(trial_move=0.01)
    sim_info = {"lengths": lengths, "nx": [128] * 6,
                "meas_types": ["TRPL"] * 6, "num_meas": 6}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": 1, "hard_bounds": 1}
    e_data = ([t] * 6, vals, [np.full(len(t), 0.05)] * 6)

    def plan_for(hm, F, refine=1):
        return build_likelihood_plan(
            sim_info, param_info, mcmc, e_data, flu,
            hmax=hm, align_outputs=False, scheme="sdirk3",
            refactor_every=F, refine=refine, escalate=False,
            newton_div_tol=np.inf)

    configs = [("h48/F4", plan_for(48.0, 4)),
               ("h24/F4", plan_for(24.0, 4)),
               ("h16/F4", plan_for(16.0, 4)),
               ("h16/F1", plan_for(16.0, 1)),
               ("h8/F4", plan_for(8.0, 4)),
               ("gold h4/F1/r2", plan_for(4.0, 1, 2))]
    outs = {}
    for tag, pl in configs:
        ev = jax.jit(make_eval_logll(pl, dtype=jnp.float32,
                                     escalate="off", backend="auto"))
        o = ev(st, jnp.asarray(temps, jnp.float32))
        outs[tag] = (np.asarray(o["resid"]), np.asarray(o["logll_T"]),
                     np.asarray(o["esc_score"]))
    K, M = outs["h48/F4"][0].shape
    ll_gold = outs["gold h4/F1/r2"][1]
    print(f"tol={NEWTON_DIV_TOL} gate_cut={ESCALATE_GATE_SCORE}; "
          f"{K} walked tempered states x {M} meas")
    for tag, _ in configs:
        resid, llm, score = outs[tag]
        own = np.array([llm[c, c] for c in range(K)])
        gown = np.array([ll_gold[c, c] for c in range(K)])
        dll = np.abs(own - gown)
        fin = np.isfinite(own) & np.isfinite(gown)
        flag = ~(resid < NEWTON_DIV_TOL)
        nanr = ~np.isfinite(resid)
        print(f"{tag:14s}: flagged {flag.sum():2d}/{K * M} "
              f"(nan-resid {nanr.sum()}), -inf states "
              f"{(~np.isfinite(own)).sum()}/{K}, "
              f"resid p50={np.nanmedian(resid):.2e} "
              f"max={np.nanmax(resid[np.isfinite(resid)]) if np.isfinite(resid).any() else float('nan'):.2e}, "
              f"|dll| max(fin)={dll[fin].max() if fin.any() else float('nan'):.3g}")


if __name__ == "__main__":
    main()
