"""Traps-model LL agreement + Newton-predicate calibration probe
(VERDICT r3 weak #5 / #4: the traps model was second-class — no
fast-mode validation, no predicate calibration).

Workload: 2 TRPL curves (311 / 2000 nm), nx=32, t <= 1000 ns (the same
oracle-tractable geometry as docs/LL_AGREEMENT_r05.md), shallow-trap
model with the validated test parameters (tests/test_forward_solver.py:
kC = 5 nm^3/ns, Nt = 1e-6 nm^-3, tauE = 300 ns). Data synthesized by the
f64 LSODA oracle (model="traps") at truth.

At 96 ball states (64 x +/-0.15 dex posterior-typical, 32 x +/-0.3 dex
wide, over the 10 std active params + kC/Nt/tauE):
  * |dll| of the fast-mode f32 sampler pipeline (h48/F4, inline
    escalation — production semantics, now using the symbolic traps
    Jacobian) vs the f64 LSODA oracle;
  * Newton-residual distribution for healthy vs broken states — the
    traps calibration of NEWTON_DIV_TOL;
  * pre-repair flag rate (escalate-free eval).

Usage: python scripts/probe_traps_ll.py [n_states] [hmax] [refactor]
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
from metrotrpl_tpu.oracle import solve_reference
from metrotrpl_tpu.oracle.scipy_reference import beer_lambert
from metrotrpl_tpu.workloads import (
    STAUB_NAMES,
    STAUB_TRUE,
    STAUB_UC,
)

NX = 32
NT = 101
T_END = 1000.0
LENGTHS = [311.0, 2000.0]
FLU = [(2.12e11, 6e4)] * 2
SIGMA = 0.05
UNC = 0.05
SEED = 20260820

#: traps extras in MODEL units (validated vs LSODA in
#: tests/test_forward_solver.py)
TRAPS_TRUE = {"kC": 5.0, "Nt": 1e15 * 1e-21, "tauE": 300.0}
NAMES = STAUB_NAMES + list(TRAPS_TRUE)
TRUE = {**STAUB_TRUE, **TRAPS_TRUE}
ACTIVE = tuple(n for n in NAMES if n not in ("n0", "eps", "Tm"))


def _pm(state):
    return {k: state[k] * STAUB_UC.get(k, 1) for k in NAMES}


def _ic(m):
    L = LENGTHS[m]
    dx = L / NX
    x = np.linspace(dx / 2, L - dx / 2, NX)
    f, a = FLU[m]
    return beer_lambert(f * 1e-14, a * 1e-7, x)


def oracle_ll(t, vals, state):
    pm = _pm(state)
    ll = 0.0
    for m, (L, v) in enumerate(zip(LENGTHS, vals)):
        try:
            pl = solve_reference(_ic(m), L, NX, t, pm, model="traps",
                                 rhs="native")
        except Exception:
            return -np.inf
        if not np.all(np.isfinite(pl)) or np.any(pl <= 0):
            return -np.inf
        ll -= np.sum((np.log10(pl) - v) ** 2 / (SIGMA ** 2 + 2 * UNC ** 2))
    return ll


def main():
    n_states = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    hmax = float(sys.argv[2]) if len(sys.argv) > 2 else 48.0
    refactor = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    t = np.linspace(0, T_END, NT)
    pm = _pm(TRUE)
    rng = np.random.default_rng(SEED)
    vals = []
    for m, L in enumerate(LENGTHS):
        pl = solve_reference(_ic(m), L, NX, t, pm, model="traps")
        vals.append(np.log10(pl) + rng.normal(0, UNC, NT))

    # ball states (same active set as the full preset + traps extras)
    n_a = 2 * n_states // 3
    states = []
    for n, width, seed in ((n_a, 0.15, 1), (n_states - n_a, 0.3, 2)):
        r = np.random.default_rng(SEED + seed)
        st = np.tile([TRUE[nm] for nm in NAMES], (n, 1))
        act = np.array([nm in ACTIVE for nm in NAMES])
        st = st * 10.0 ** (r.uniform(-width, width, st.shape) * act)
        states.append(st)
    states = np.concatenate(states)

    # --- tpu fast-mode ll (production pipeline, traps model) ---
    param_info = {
        "names": NAMES,
        "unit_conversions": dict(STAUB_UC),
        "do_log": {n: 1 for n in NAMES},
        "active": {n: int(n in ACTIVE) for n in NAMES},
        "init_guess": dict(TRUE),
        "prior_dist": {n: (1e-32, 1e32) for n in NAMES},
        "trial_move": {n: 0.01 for n in NAMES},
    }
    M = len(LENGTHS)
    sim_info = {"lengths": LENGTHS, "nx": [NX] * M,
                "meas_types": ["TRPL"] * M, "num_meas": M}
    mcmc = {"ini_mode": "fluence", "model": "traps", "log_y": 1,
            "model_uncertainty": SIGMA, "hard_bounds": 1}
    iniPar = np.array([[f, a, 1] for f, a in FLU])
    e_data = ([t] * M, vals, [np.full(NT, UNC)] * M)
    plan = build_likelihood_plan(sim_info, param_info, mcmc, e_data, iniPar,
                                 hmax=hmax, align_outputs=False,
                                 refactor_every=refactor)
    sj = jnp.asarray(states, jnp.float32)
    temps1 = jnp.asarray([1.0])
    out_in = jax.jit(make_eval_logll(plan, dtype=jnp.float32,
                                     escalate="inline", backend="auto"))(
        sj, temps1)
    out_off = jax.jit(make_eval_logll(plan, dtype=jnp.float32,
                                      escalate="off", backend="auto"))(
        sj, temps1)
    ll_t = np.asarray(out_in["logll_T"])[:, 0]
    resid = np.asarray(out_off["resid"])       # (S, M) pre-repair
    flags = np.asarray(out_off["fail_states"])

    # --- oracle ll (f64 LSODA, serial CPU) ---
    ll_o = np.empty(n_states)
    clock = time.perf_counter()
    for i in range(n_states):
        state = {nm: float(states[i, j]) for j, nm in enumerate(NAMES)}
        ll_o[i] = oracle_ll(t, vals, state)
        if (i + 1) % 16 == 0:
            print(f"  oracle {i + 1}/{n_states} "
                  f"({(time.perf_counter() - clock) / (i + 1):.2f} s/state)",
                  flush=True)

    fin = np.isfinite(ll_t) & np.isfinite(ll_o)
    d = np.abs(ll_t - ll_o)[fin]
    q = np.percentile(d, [50, 90, 99, 100])
    print(f"\ntraps LL agreement (fast h{hmax:g}/F{refactor} f32 vs f64 "
          f"LSODA oracle), {int(fin.sum())}/{n_states} finite both:")
    print(f"|dll| p50={q[0]:.3f} p90={q[1]:.3f} p99={q[2]:.3f} "
          f"max={q[3]:.3f}  (ll scale ~{np.median(np.abs(ll_o[fin])):.0f})")
    print(f"pre-repair flag rate: {int((flags > 0).sum())}/{n_states} "
          f"states")

    healthy = fin & (np.abs(ll_t - ll_o) < 1)
    broken = np.abs(np.where(np.isfinite(ll_t) & np.isfinite(ll_o),
                             ll_t - ll_o, np.inf)) > 20
    rmax = np.nanmax(np.where(np.isfinite(resid), resid, np.nan), axis=1)
    for tag, mask in (("healthy(|dll|<1)", healthy),
                      ("broken(|dll|>20 or -inf mismatch)", broken)):
        r = rmax[mask]
        r = r[np.isfinite(r)]
        if len(r):
            print(f"resid {tag}: p50={np.percentile(r, 50):.2e} "
                  f"p99={np.percentile(r, 99):.2e} max={r.max():.2e} "
                  f"n={len(r)}")
        else:
            print(f"resid {tag}: none")


if __name__ == "__main__":
    main()
