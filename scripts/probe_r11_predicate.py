"""TPU probe: calibrate the contraction-extrapolated Newton diagnostic
(solver/sdirk.py RESID_MODE="qest") against the round-8 "last-update"
definition.

Motivation (BENCH r4 finding): under production deferred-escalation
semantics the tempered hot chains (T up to 128, i.e. ~prior-wide states)
trip the round-8 predicate on ~every iteration, so the 12x-cost
escalated re-solve runs continuously and the flagship walk drops from
~2900 to ~210 walker-steps/s. The round-8 calibration showed the bands
OVERLAP for the raw last update (healthy far-off resid up to 0.47 vs
broken min 2.0e-2) — no threshold fixes that. The q-estimate scores a
slowly-CONTRACTING iteration by its extrapolated remaining error
(q = |u_k| rho/(1-rho)) instead of its raw update, and blows up for
non-contracting ones, so it can only separate better IF healthy far-off
states actually contract. This probe measures that, at three state sets:

  * the mu_n x mu_p collapse-region grid (known-broken rows),
  * 192 posterior-ball states (+/-0.3 dex),
  * 128 prior-box log-uniform states (the hot-chain population).

Ground truth per state: |dll| vs gold (h4/refine2/chord-free).

Usage: python scripts/probe_r11_predicate.py [n_ball] [n_prior]
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

import metrotrpl_tpu.solver.sdirk as sdirk
from metrotrpl_tpu.inference.likelihood import (
    build_likelihood_plan,
    make_eval_logll,
)
from metrotrpl_tpu.workloads import STAUB_PRIOR


def build_states(n_ball, n_prior):
    names = list(pc.NAMES)
    base = np.array([pc.TRUE[n] for n in names])
    states, labels = [], []
    for mun in np.geomspace(5, 100, 8):
        for mup in np.geomspace(5, 100, 8):
            s = base.copy()
            s[names.index("mu_n")] = mun
            s[names.index("mu_p")] = mup
            states.append(s)
            labels.append("grid")
    rng = np.random.default_rng(20260819)
    act = np.array([n in pc.ACTIVE for n in names])
    for _ in range(n_ball):
        shift = rng.uniform(-0.3, 0.3, len(names)) * act
        states.append(base * 10.0 ** shift)
        labels.append("ball")
    # hot-chain population: log-uniform over the finite prior box
    rng2 = np.random.default_rng(20260821)
    for _ in range(n_prior):
        s = base.copy()
        for j, n in enumerate(names):
            if n in pc.ACTIVE:
                lo, hi = STAUB_PRIOR[n]
                if np.isfinite(lo) and np.isfinite(hi) and lo > 0:
                    s[j] = 10 ** rng2.uniform(np.log10(lo), np.log10(hi))
        # keep the tn/tp support constraint both samplers share
        tn, tp = s[names.index("tauN")], s[names.index("tauP")]
        if abs(np.log10(tn) - np.log10(tp)) > 2:
            s[names.index("tauP")] = tn * 10 ** rng2.uniform(-1.5, 1.5)
        states.append(s)
        labels.append("prior")
    return np.array(states), labels


def eval_states(plan, states, mode):
    old = sdirk.RESID_MODE
    sdirk.RESID_MODE = mode
    try:
        ev = jax.jit(make_eval_logll(plan, dtype=jnp.float32,
                                     backend="auto"))
        S = len(states)
        C = 64
        ll = np.empty(S)
        rs = np.empty((S, plan.n_meas), np.float32)
        base = states[0]
        t0 = time.perf_counter()
        for c0 in range(0, S, C):
            c1 = min(c0 + C, S)
            blk = np.tile(base, (C, 1))
            blk[:c1 - c0] = states[c0:c1]
            out = ev(jnp.asarray(blk, jnp.float32), jnp.ones(1, jnp.float32))
            ll[c0:c1] = np.asarray(out["logll_T"])[:c1 - c0, 0]
            rs[c0:c1] = np.asarray(out["resid"])[:c1 - c0]
            print(f"    {c1}/{S} ({time.perf_counter() - t0:.1f} s)",
                  flush=True)
        return ll, rs
    finally:
        sdirk.RESID_MODE = old


def main():
    n_ball = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    n_prior = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    t, vals = pc.make_dataset()
    states, labels = build_states(n_ball, n_prior)
    labels = np.array(labels)

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

    # predicate disabled (newton_div_tol=inf): calibrate on the RAW
    # fast-mode ll/resid of unescalated solves
    plan_fast = build_likelihood_plan(
        sim_info, param_info, mcmc, e_data, iniPar, hmax=48.0,
        align_outputs=False, refactor_every=4, escalate=False,
        newton_div_tol=np.inf)
    plan_gold = build_likelihood_plan(
        sim_info, param_info, mcmc, e_data, iniPar, hmax=4.0,
        align_outputs=False, refactor_every=1, refine=2, escalate=False,
        newton_div_tol=np.inf)

    print("gold ll...", flush=True)
    ll_g, _ = eval_states(plan_gold, states, "last")
    results = {}
    for mode in ("last", "qest"):
        print(f"fast ll + resid, mode={mode} ...", flush=True)
        results[mode] = eval_states(plan_fast, states, mode)

    ll_f = results["last"][0]
    both = np.isfinite(ll_f) & np.isfinite(ll_g)
    dll = np.abs(ll_f - ll_g)
    healthy = both & (dll < 0.5)
    broken = (both & (dll > 20)) | (~np.isfinite(ll_f) & np.isfinite(ll_g))
    print(f"\n{len(states)} states: healthy {healthy.sum()} broken "
          f"{broken.sum()} (gold -inf: {(~np.isfinite(ll_g)).sum()})")
    for mode in ("last", "qest"):
        rmax = results[mode][1].max(axis=1)
        print(f"\nmode={mode}:")
        for subset in ("grid", "ball", "prior"):
            m = labels == subset
            h, b = healthy & m, broken & m
            hmaxr = np.nanmax(rmax[h]) if h.any() else float("nan")
            bminr = np.nanmin(rmax[b]) if b.any() else float("nan")
            print(f"  {subset:5s}: healthy n={h.sum():3d} resid "
                  f"p50={np.nanmedian(rmax[h]) if h.any() else np.nan:.2e} "
                  f"max={hmaxr:.2e} | broken n={b.sum():3d} "
                  f"resid min={bminr:.2e}")
        for tol in (1e-2, 0.1, 1.0):
            fp = (healthy & (rmax > tol)).sum()
            fn = (broken & ~(rmax > tol)
                  & np.isfinite(rmax)).sum()
            print(f"  tol={tol:g}: FP={fp}/{healthy.sum()} "
                  f"FN={fn}/{broken.sum()}")


if __name__ == "__main__":
    main()
