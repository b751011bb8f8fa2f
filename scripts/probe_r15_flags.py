"""Round-15 probe: per-row flag/gate decomposition at the bench
stationary point — the data for the escalation-ladder redesign.

Runs the bench staub walk (8 tempered chains, nx=128, h48/F4, sigma=1)
for `n_win` windows through the PRODUCTION inline kernel, then at every
window's end states (post burn-in) dumps, per (chain, measurement) row:

* static failure (non-finite / clamp-touched output),
* Newton residual (is it pinned at the damping cap?),
* fit score (the escalation gate input), gate open/closed,
* which rows would fire the repair cond under the current rule
  (bad & gate) vs alternatives ("pinned|static always repair").

Questions this answers (docs/TPU_NOTES.md round-10 follow-up):
1. At stationarity, which rows keep firing the rung (class: static,
   pinned, sub-cap-flagged), and at which chain temperatures?
2. Would tol=1.8 (cap-adjacent) change the firing set vs tol=1.0?
3. How often per window does ANY row fire (the fused-kernel cond rate)?

Usage: python scripts/probe_r15_flags.py [n_win] [window] [n_burn]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from metrotrpl_tpu.inference.likelihood import make_eval_logll
from metrotrpl_tpu.inference.metropolis import build_mh_kernel
from metrotrpl_tpu.solver.sdirk import NEWTON_DAMP


def main():
    n_win = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_burn = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    lengths, flu, t, pm = bench._workload()
    curves, _, _ = bench._oracle_curves(lengths, flu, t, pm)
    plan, move_plan, temps, base_move, states0 = bench._build_inference(
        lengths, flu, t, curves, hmax=48.0, align_outputs=False,
        scheme="sdirk3", refactor_every=4)

    kern = build_mh_kernel(
        plan, move_plan, temps, base_move, temper_freq=10,
        do_tempering=True, window=window, dtype=jnp.float32,
        backend="auto", escalate="inline")
    # escalate-free diagnostic eval of the SAME plan (fast config)
    ev = jax.jit(make_eval_logll(plan, dtype=jnp.float32, escalate="off",
                                 backend="auto"))

    st = states0
    ll = jax.block_until_ready(kern.init_ll(st))
    k = 1
    key = jax.random.PRNGKey(0)
    rows = []      # (win, chain, meas, resid, static, score)
    for w in range(n_win):
        st, ll, _, _, nfail, _ = kern.run_window(st, ll, jnp.asarray(k), key)
        jax.block_until_ready(st)
        k += window
        if w < n_burn:
            continue
        o = ev(st, jnp.asarray(temps, jnp.float32))
        resid = np.asarray(o["resid"])           # (K, M)
        score = np.asarray(o["esc_score"])
        pm_ll = np.asarray(o["per_meas"])[:, :, 0]
        static = ~np.isfinite(pm_ll) & (resid < 1e30)  # -inf with finite
        # static fail detection: the eval nan-outs conceded rows; infer
        # static separately: a row with finite resid below tol yet -inf
        # per-meas ll must have failed the static/compare test
        K, M = resid.shape
        for c in range(K):
            for m in range(M):
                rows.append((w, c, m, resid[c, m],
                             not np.isfinite(pm_ll[c, m]), score[c, m]))
    rows = np.array([(w, c, m, r, s, sc) for w, c, m, r, s, sc in rows],
                    dtype=float)
    w_, c_, m_, resid, inf_row, score = rows.T
    inf_row = inf_row.astype(bool)
    pinned = ~(resid < NEWTON_DAMP * 0.97)
    flag10 = ~(resid < 1.0)
    flag18 = ~(resid < 1.8)
    gate = score < 0.25
    n = len(rows)
    nw = n_win - n_burn
    print(f"{nw} stationary windows x 8 chains x 6 meas = {n} rows")
    print(f"-inf rows (conceded/static): {int(inf_row.sum())}/{n}")
    print(f"resid pinned at cap (>= {NEWTON_DAMP * 0.97:.2f}): "
          f"{int(pinned.sum())}/{n}")
    print(f"flagged at tol=1.0: {int(flag10.sum())}  at tol=1.8: "
          f"{int(flag18.sum())}  (sub-cap 1.0-1.8 band: "
          f"{int((flag10 & ~flag18).sum())})")
    print(f"gate open (score<0.25): {int(gate.sum())}/{n}")
    fire_cur = (flag10 | inf_row) & gate
    fire_alt = pinned | inf_row          # "pinned|static always repair"
    print(f"repair fires, CURRENT rule (flag10|static)&gate: "
          f"{int(fire_cur.sum())}")
    print(f"repair fires, ALT rule pinned|static (no gate): "
          f"{int(fire_alt.sum())}")
    print(f"ALT & gate-open only: {int((fire_alt & gate).sum())}")
    # per-chain (temperature) decomposition
    print("\nper-chain breakdown (chain: T, -inf rows, pinned, "
          "gate-open, fire_cur):")
    temps_np = np.asarray(temps)
    for c in range(8):
        sel = c_ == c
        print(f"  chain {c} (T={temps_np[c]:6.1f}): inf {int(inf_row[sel].sum()):3d} "
              f"pinned {int(pinned[sel].sum()):3d} "
              f"gate {int(gate[sel].sum()):3d} "
              f"fire {int(fire_cur[sel].sum()):3d}  / {int(sel.sum())}")
    # per-measurement
    print("\nper-meas breakdown (meas: len/flu, -inf, pinned):")
    for m in range(6):
        sel = m_ == m
        print(f"  meas {m} ({lengths[m]:.0f} nm, {flu[m][0]:.2e}): "
              f"inf {int(inf_row[sel].sum()):3d} "
              f"pinned {int(pinned[sel].sum()):3d} / {int(sel.sum())}")
    # sub-cap flagged rows: their score and resid values (are they the
    # healthy band or genuinely broken?)
    sub = flag10 & ~pinned
    if sub.any():
        print(f"\nsub-cap flagged rows ({int(sub.sum())}): resid "
              f"{np.array2string(np.sort(resid[sub])[:12], precision=2)} "
              f"score p50 {np.median(score[sub]):.3g}")


if __name__ == "__main__":
    main()
