"""TPU probe: calibrate the Newton-convergence failure threshold.

The round-7 escalation ladder keyed on a STATIC predicate (underflow-clamp
touch) and missed ~5/192 posterior-typical states whose h48 chord solve
partially collapses while staying above the clamp (|dll| 20..9.7e3,
docs/LL_AGREEMENT_r05.md). This probe measures the DYNAMIC predicate that
replaces it — the per-solve max |last Newton update| surfaced by
solve_forward_batch(with_diag=True) — across:

  * a mu_n x mu_p grid spanning the measured collapse region
    (mu_n ~ 13-27 x mu_p ~ 43-95, TPU_NOTES round-7) and healthy space
  * random posterior-ball states around the full-preset truth

For every state it reports the residual (max over measurements) against
|ll_fast - ll_gold| where gold = hmax=4, refine=2, chord-free (matches the
f64 LSODA oracle to <0.04 everywhere measured, LL_AGREEMENT_r05). A usable
threshold must separate max(resid | dll small) from min(resid | dll large)
by orders of magnitude.

Usage: python scripts/probe_r8_resid.py [n_random]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

import posterior_compare as pc

pc.apply_preset("full")

import metrotrpl_tpu.inference.likelihood as lk
from metrotrpl_tpu.inference.likelihood import (
    NEWTON_DIV_TOL,
    build_likelihood_plan,
    make_eval_logll,
)

# calibration needs the RAW fast-mode ll at diverged states (the quantity
# the threshold protects against), so disable the dynamic predicate while
# tracing the eval functions; the static clamp predicate stays (full
# collapses are already known-broken, counted separately below)
lk.NEWTON_DIV_TOL = float("inf")


def main():
    n_random = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    t, vals = pc.make_dataset()

    param_info = {
        "names": pc.NAMES,
        "unit_conversions": pc.UC,
        "do_log": {n: 1 for n in pc.NAMES},
        "active": {n: int(n in pc.ACTIVE) for n in pc.NAMES},
        "init_guess": {**pc.TRUE, **pc.START},
        "prior_dist": {n: pc.PRIOR.get(n, (1e-32, 1e32)) for n in pc.NAMES},
        "trial_move": {n: pc.WIDTH for n in pc.NAMES},
    }
    M = len(pc.LENGTHS)
    sim_info = {"lengths": pc.LENGTHS, "nx": [pc.NX] * M,
                "meas_types": ["TRPL"] * M, "num_meas": M}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": pc.SIGMA, "hard_bounds": 1}
    iniPar = np.array([[f, a, 1] for f, a in pc.FLU])
    e_data = ([t] * M, vals, [np.full(pc.NT, pc.UNC)] * M)

    plan_fast = build_likelihood_plan(
        sim_info, param_info, mcmc, e_data, iniPar, hmax=48.0,
        align_outputs=False, refactor_every=4, escalate=False)
    plan_gold = build_likelihood_plan(
        sim_info, param_info, mcmc, e_data, iniPar, hmax=4.0,
        align_outputs=False, refactor_every=1, refine=2, escalate=False)
    ev_fast = jax.jit(make_eval_logll(plan_fast, dtype=jnp.float32,
                                      backend="auto"))
    ev_gold = jax.jit(make_eval_logll(plan_gold, dtype=jnp.float32,
                                      backend="auto"))
    temps = jnp.ones(1, jnp.float32)

    # ---- states ----
    names = list(pc.NAMES)
    base = np.array([pc.TRUE[n] for n in names])
    states = []
    labels = []
    # collapse-region grid: mu_n x mu_p log grids straddling the measured
    # failure band, everything else at truth
    for mun in np.geomspace(5, 100, 8):
        for mup in np.geomspace(5, 100, 8):
            s = base.copy()
            s[names.index("mu_n")] = mun
            s[names.index("mu_p")] = mup
            states.append(s)
            labels.append(f"grid mu_n={mun:.1f} mu_p={mup:.1f}")
    # random posterior-ball states (log-uniform +/-0.3 dex on actives)
    rng = np.random.default_rng(20260819)
    act = np.array([n in pc.ACTIVE for n in names])
    for i in range(n_random):
        shift = rng.uniform(-0.3, 0.3, len(names)) * act
        states.append(base * 10.0 ** shift)
        labels.append(f"ball {i}")
    states = np.array(states)
    S = len(states)

    C = 64
    ll_f = np.empty(S)
    ll_g = np.empty(S)
    rs = np.empty((S, M), np.float32)
    t0 = time.perf_counter()
    for c0 in range(0, S, C):
        c1 = min(c0 + C, S)
        blk = np.tile(base, (C, 1))
        blk[:c1 - c0] = states[c0:c1]
        b = jnp.asarray(blk, jnp.float32)
        rf = ev_fast(b, temps)
        rg = ev_gold(b, temps)
        ll_f[c0:c1] = np.asarray(rf["logll_T"])[:c1 - c0, 0]
        ll_g[c0:c1] = np.asarray(rg["logll_T"])[:c1 - c0, 0]
        rs[c0:c1] = np.asarray(rf["resid"])[:c1 - c0]
        print(f"  {c1}/{S} ({time.perf_counter() - t0:.1f} s)", flush=True)

    rmax = rs.max(axis=1)
    dll = np.abs(ll_f - ll_g)
    both = np.isfinite(ll_f) & np.isfinite(ll_g)
    print(f"\nthreshold NEWTON_DIV_TOL = {NEWTON_DIV_TOL:g}")
    print(f"{S} states; finite fast/gold: {np.isfinite(ll_f).sum()}"
          f"/{np.isfinite(ll_g).sum()}")
    clamped = ~np.isfinite(ll_f) & np.isfinite(ll_g)
    if clamped.any():
        print(f"static-clamp -inf fast rows: {clamped.sum()}, their resid "
              f"min {rmax[clamped].min():.3e} (dynamic predicate should "
              "subsume them)")
    healthy = both & (dll < 0.5)
    broken = both & (dll > 20)
    mid = both & ~healthy & ~broken
    # -inf fast rows: the predicate already fired (bad -> nan); resid of
    # the unescalated solve is what we calibrate on, so report it raw
    print(f"healthy (|dll|<0.5): {healthy.sum()}, resid max "
          f"{rmax[healthy].max() if healthy.any() else float('nan'):.3e}")
    print(f"broken (|dll|>20):   {broken.sum()}, resid min "
          f"{rmax[broken].min() if broken.any() else float('nan'):.3e}")
    print(f"mid (0.5..20):       {mid.sum()}")
    for i in np.argsort(-dll * both)[:16]:
        print(f"  {labels[i]:34s} dll {dll[i]:10.2f} resid {rmax[i]:.3e} "
              f"ll_f {ll_f[i]:.1f} ll_g {ll_g[i]:.1f}")
    print("\nhighest-resid healthy states:")
    hi = np.argsort(-(rmax * healthy))[:8]
    for i in hi:
        print(f"  {labels[i]:34s} dll {dll[i]:10.3f} resid {rmax[i]:.3e}")
    # how many rows the predicate would escalate overall (perf relevance)
    print(f"\nrows with resid > tol: {(rmax > NEWTON_DIV_TOL).sum()}/{S}")
    fneg = both & broken & (rmax < NEWTON_DIV_TOL)
    fpos = both & healthy & (rmax > NEWTON_DIV_TOL)
    print(f"false negatives (broken, resid<tol): {fneg.sum()}")
    print(f"false positives (healthy, resid>tol): {fpos.sum()}")


if __name__ == "__main__":
    main()
