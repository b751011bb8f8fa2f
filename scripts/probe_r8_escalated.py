"""TPU probe: verify the dynamic Newton predicate END-TO-END.

probe_r8_resid.py calibrated NEWTON_DIV_TOL on raw (escalation-off)
solves: 0 false negatives at 1e-2 but ~half of wide-ball healthy states
flag spuriously. This probe checks that the full production ladder
(escalate="inline": flagged row -> refined chord-free re-solve ->
-inf only if the re-solve also fails) turns those flags into REPAIRS:

  * no state that the gold solve (hmax=4, refine=2, chord-free) finds
    finite may end -inf after escalation (would wrongly reject healthy
    proposals in the sampler)
  * post-escalation |ll - ll_gold| must collapse the round-7 tail
    (was |dll| up to 9.7e3 on 5/192 states, docs/LL_AGREEMENT_r05.md)

Usage: python scripts/probe_r8_escalated.py [n_random]
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

from metrotrpl_tpu.inference.likelihood import (
    NEWTON_DIV_TOL,
    build_likelihood_plan,
    make_eval_logll,
)


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

    # production fast plan WITH the escalation ladder (same knobs the
    # posterior_compare sampler uses)
    plan_fast = build_likelihood_plan(
        sim_info, param_info, mcmc, e_data, iniPar, hmax=48.0,
        align_outputs=False, refactor_every=4, escalate=True)
    plan_gold = build_likelihood_plan(
        sim_info, param_info, mcmc, e_data, iniPar, hmax=4.0,
        align_outputs=False, refactor_every=1, refine=2, escalate=False)
    ev_fast = jax.jit(make_eval_logll(plan_fast, dtype=jnp.float32,
                                      backend="auto", escalate="inline"))
    ev_gold = jax.jit(make_eval_logll(plan_gold, dtype=jnp.float32,
                                      backend="auto"))
    temps = jnp.ones(1, jnp.float32)

    names = list(pc.NAMES)
    base = np.array([pc.TRUE[n] for n in names])
    states = []
    labels = []
    for mun in np.geomspace(5, 100, 8):
        for mup in np.geomspace(5, 100, 8):
            s = base.copy()
            s[names.index("mu_n")] = mun
            s[names.index("mu_p")] = mup
            states.append(s)
            labels.append(f"grid mu_n={mun:.1f} mu_p={mup:.1f}")
    rng = np.random.default_rng(20260819)  # same seed as probe_r8_resid
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
    nfail = 0
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
        nfail += int(rf["n_solver_fail"])
        print(f"  {c1}/{S} ({time.perf_counter() - t0:.1f} s)", flush=True)

    dll = np.abs(ll_f - ll_g)
    both = np.isfinite(ll_f) & np.isfinite(ll_g)
    wrongly_dead = ~np.isfinite(ll_f) & np.isfinite(ll_g)
    print(f"\nNEWTON_DIV_TOL = {NEWTON_DIV_TOL:g}, escalate=inline")
    print(f"{S} states; finite fast/gold: {np.isfinite(ll_f).sum()}"
          f"/{np.isfinite(ll_g).sum()}; post-repair fail count {nfail}")
    print(f"WRONGLY -inf (gold finite, escalated fast -inf): "
          f"{wrongly_dead.sum()}")
    for i in np.where(wrongly_dead)[0][:12]:
        print(f"  {labels[i]:34s} ll_g {ll_g[i]:.1f}")
    if both.any():
        q = np.quantile(dll[both], [0.5, 0.9, 0.99])
        print(f"|dll| over {both.sum()} finite-both states: "
              f"p50 {q[0]:.3f} p90 {q[1]:.3f} p99 {q[2]:.3f} "
              f"max {dll[both].max():.3f}")
        for i in np.argsort(np.where(both, -dll, np.inf))[:8]:
            print(f"  {labels[i]:34s} dll {dll[i]:10.3f} "
                  f"ll_f {ll_f[i]:.1f} ll_g {ll_g[i]:.1f}")


if __name__ == "__main__":
    main()
