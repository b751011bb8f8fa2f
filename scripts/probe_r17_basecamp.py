"""Round-17 probe: can a cheap f32 BASE variant eliminate the stationary
camping class at the bench workload?

Round-15 data: at bench stationarity ~16% of (chain, meas) rows are
static/pinned collapses of the fast h48/F4 base — cold chain included —
so the repair rung fires essentially every window and the fused kernel
always-pays it. The ridge work showed the f32/f64 error is EARLY-TIME
(ramp) dominated. If a finer ramp (smaller h0 / refined ramp) makes the
f32 base solve these walked states, stationary flags become rare and the
fused hot path never escalates.

Runs the bench walk 12 windows (inline kernel, production dynamics),
collects the last 6 windows' end states (48 states), and evaluates f32
base variants + references at ALL of them, reporting -inf rows, pinned
rows, and |dll| vs the f64 fast-r2 reference.

Usage: python scripts/probe_r17_basecamp.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
from metrotrpl_tpu import enable_compile_cache  # noqa: E402
enable_compile_cache()
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from metrotrpl_tpu.inference.likelihood import (  # noqa: E402
    build_likelihood_plan,
    make_eval_logll,
)
from metrotrpl_tpu.inference.metropolis import build_mh_kernel  # noqa: E402
from metrotrpl_tpu.solver.sdirk import NEWTON_DAMP  # noqa: E402


def main():
    n_win, window, n_keep = 12, 100, 6
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
    k, key = 1, jax.random.PRNGKey(0)
    kept = []
    for w in range(n_win):
        st, ll, _, _, _, _ = kern.run_window(st, ll, jnp.asarray(k), key)
        jax.block_until_ready(st)
        k += window
        if w >= n_win - n_keep:
            kept.append(np.asarray(st))
    block = np.concatenate(kept, axis=0)          # (48, P)
    S = block.shape[0]

    param_info = bench.staub_param_info(trial_move=0.01)
    sim_info = {"lengths": lengths, "nx": [128] * 6,
                "meas_types": ["TRPL"] * 6, "num_meas": 6}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": 1, "hard_bounds": 1}
    vals = [np.log10(c) for c in curves]
    e_data = ([t] * 6, vals, [np.full(len(t), 0.05)] * 6)

    def run_eval(tag, hm, rf, refine, dt, bk, h0=1e-3, ramp_block=1):
        plan_x = build_likelihood_plan(
            sim_info, param_info, mcmc, e_data, flu, hmax=hm,
            align_outputs=False, refactor_every=rf, refine=refine,
            escalate=False, h0=h0, ramp_block=ramp_block)
        ev = jax.jit(make_eval_logll(plan_x, dtype=dt, backend=bk,
                                     escalate="off", eval_chunk=16))
        c0 = time.perf_counter()
        out = ev(jnp.asarray(block, dt), jnp.asarray([1.0], dt))
        jax.block_until_ready(out["logll_T"])
        compile_s = time.perf_counter() - c0
        c0 = time.perf_counter()
        out = ev(jnp.asarray(block, dt), jnp.asarray([1.0], dt))
        jax.block_until_ready(out["logll_T"])
        run_ms = (time.perf_counter() - c0) * 1e3
        return (np.asarray(out["per_meas"])[:, :, 0],
                np.asarray(out["resid"]), run_ms, compile_s,
                plan_x.fwd[0][1].n_steps)

    if "--goldref" in sys.argv[1:]:
        # f32 gold as the reference: sound at every measured walked state
        # (probe_r13: 0 flagged, 0 -inf; r16: wrong only on mu>50-class
        # rows) and compiles in seconds, where the emulated-f64 reference
        # leg takes ~10-16 min through the remote compiler
        pm64, _, ms64, _, _ = run_eval("ref", 4.0, 1, 2, jnp.float32,
                                       "auto")
    else:
        pm64, _, ms64, _, _ = run_eval("ref", 48.0, 4, 2, jnp.float64,
                                       "xla")
    configs = [
        ("f32 h48/F4 (today)", 48.0, 4, 1, jnp.float32, "auto", 1e-3, 1),
        ("f32 h48/F4 h0=1e-4", 48.0, 4, 1, jnp.float32, "auto", 1e-4, 1),
        ("f32 h48/F4 r2", 48.0, 4, 2, jnp.float32, "auto", 1e-3, 1),
        ("f32 h48/F4 h0=1e-4 rb4", 48.0, 4, 1, jnp.float32, "auto",
         1e-4, 4),
        ("f32 h16/F1 (rung)", 16.0, 1, 1, jnp.float32, "auto", 1e-3, 1),
        ("f32 h4/r2 (gold)", 4.0, 1, 2, jnp.float32, "auto", 1e-3, 1),
    ]
    print(f"{S} walked stationary states; f64 fast-r2 reference "
          f"({ms64:.0f} ms/eval)", flush=True)
    for cfg in configs:
        tag, hm, rf, refine, dt, bk, h0, rb = cfg
        pmx, rx, ms, cs, nst = run_eval(tag, hm, rf, refine, dt, bk, h0, rb)
        inf_rows = int((~np.isfinite(pmx) & np.isfinite(pm64)).sum())
        pinned = int((~(rx < NEWTON_DAMP * 0.97)).sum())
        d = np.abs(pmx - pm64)
        fin = np.isfinite(d)
        wrong = int((np.where(fin, d, np.inf) > 1.0).sum()) - inf_rows
        print(f"{tag:24s}: -inf rows {inf_rows:3d}/{S * 6} "
              f"pinned {pinned:3d} wrong(fin,|dll|>1) {wrong:3d} "
              f"|dll| p50 {np.median(d[fin]):7.3g} "
              f"p99 {np.percentile(d[fin], 99) if fin.any() else np.nan:7.3g}"
              f"  [{ms:6.0f} ms, {nst} steps, compile {cs:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
