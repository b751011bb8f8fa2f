"""TPU probe: choose the escalation rung + predicate tolerance that fix
the BENCH r4 production-throughput collapse.

BENCH r4 measured the flagship walk at ~210 walker-steps/s under
production deferred-escalation semantics (vs 2900 hot-path): tempered
hot chains live at ~prior-wide states where the round-8 predicate
(tol=1e-2) flags ~half of healthy rows, and the escalated re-solve
(h4 + refine x2 = ~1050 steps vs 86) costs ~12x base — so the inline
cond fires ~every iteration. probe_r11 showed convergence-RATE evidence
cannot cut the false positives (healthy far-off rows are
non-contracting), leaving two levers this probe calibrates:

  1. the predicate tolerance (newton_div_tol): FP/true-FN trade at
     1e-2 / 3e-2 / 0.1 (true FN = finite-ll broken rows the CLAMP test
     also missed — clamp-caught rows are already -inf);
  2. the rung cost: |dll| vs gold of cheap rung candidates
     (h16, h8, h4; all F1 chord-free refine 1) AT the fast-flagged rows
     — if a ~2-4x rung repairs what the 12x gold rung repairs, the
     always-firing hot-chain cond becomes affordable.

Usage: python scripts/probe_r12_ladder.py [n_ball] [n_prior]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import posterior_compare as pc

pc.apply_preset("full")

from probe_r11_predicate import build_states, eval_states

from metrotrpl_tpu.inference.likelihood import build_likelihood_plan


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

    def plan_for(hm, refactor, refine):
        return build_likelihood_plan(
            sim_info, param_info, mcmc, e_data, iniPar, hmax=hm,
            align_outputs=False, refactor_every=refactor, refine=refine,
            escalate=False, newton_div_tol=np.inf)

    print("gold (h4 refine2 F1) ...", flush=True)
    ll_g, _ = eval_states(plan_for(4.0, 1, 2), states, "last")
    print("fast (h48 F4) ...", flush=True)
    ll_f, rs_f = eval_states(plan_for(48.0, 4, 1), states, "last")
    rmax_f = np.nanmax(np.where(np.isfinite(rs_f), rs_f, np.nan), axis=1)
    rmax_f = np.where(np.isfinite(rs_f).all(axis=1), rs_f.max(axis=1),
                      np.inf)

    both = np.isfinite(ll_f) & np.isfinite(ll_g)
    dll = np.abs(ll_f - ll_g)
    healthy = both & (dll < 0.5)
    true_broken = both & (dll > 20)          # finite ll, clamp MISSED it
    clamp_caught = ~np.isfinite(ll_f) & np.isfinite(ll_g)
    print(f"\n{len(states)} states: healthy {healthy.sum()}, "
          f"true-broken(finite but off) {true_broken.sum()}, "
          f"clamp-caught {clamp_caught.sum()}, "
          f"gold--inf {(~np.isfinite(ll_g)).sum()}")
    for tol in (1e-2, 3e-2, 0.1, 0.3):
        fp = healthy & (rmax_f > tol)
        fn = true_broken & ~(rmax_f > tol)
        # per-subset FP rates drive the hot-chain cond-fire frequency
        per = {s: (int((fp & (labels == s)).sum()),
                   int((healthy & (labels == s)).sum()))
               for s in ("grid", "ball", "prior")}
        perfn = {s: int((fn & (labels == s)).sum())
                 for s in ("grid", "ball", "prior")}
        print(f"tol={tol:g}: FP {fp.sum()}/{healthy.sum()} {per} | "
              f"true-FN {fn.sum()}/{true_broken.sum()} {perfn}")
    # every true-broken row, with its gold ll LEVEL: a huge dll at a
    # state whose ll is astronomically low anyway is sampling-irrelevant
    # (never accepted, never swapped); what matters is FN rows with
    # ll_g within reach of the tempered ladder
    print("\ntrue-broken rows (subset, resid, dll, ll_gold):")
    for i in np.nonzero(true_broken)[0]:
        print(f"  {labels[i]:5s} resid={rmax_f[i]:9.3g} "
              f"dll={dll[i]:12.4g} ll_g={ll_g[i]:12.4g}")

    # rung candidates at the rows the FAST mode flags (tol=1e-2 superset)
    flagged = (rmax_f > 1e-2) | clamp_caught
    print(f"\nflagged-at-1e-2 rows: {flagged.sum()} "
          f"(these are what a rung must repair)")
    for hm, nsteps_note in ((16.0, "~175 steps ~2x"),
                            (8.0, "~300 steps ~3.5x"),
                            (4.0, "~550 steps ~6x")):
        ll_m, rs_m = eval_states(plan_for(hm, 1, 1), states, "last")
        rmax_m = np.where(np.isfinite(rs_m).all(axis=1), rs_m.max(axis=1),
                          np.inf)
        ok = flagged & np.isfinite(ll_m) & np.isfinite(ll_g)
        d_m = np.abs(ll_m - ll_g)[ok]
        still = flagged & ((rmax_m > 1e-2) | ~np.isfinite(ll_m))
        q = (np.percentile(d_m, [50, 90, 99, 100])
             if ok.any() else [np.nan] * 4)
        # quality of rows the rung would CERTIFY (pass its own predicate)
        cert = flagged & ~(rmax_m > 1e-2) & np.isfinite(ll_m) \
            & np.isfinite(ll_g)
        d_c = np.abs(ll_m - ll_g)[cert]
        qc = (np.percentile(d_c, [50, 99, 100])
              if cert.any() else [np.nan] * 3)
        print(f"rung h{hm:g}/F1/refine1 ({nsteps_note}): repaired "
              f"|dll| p50={q[0]:.3g} p90={q[1]:.3g} p99={q[2]:.3g} "
              f"max={q[3]:.3g}; still-flagged {still.sum()}"
              f"/{flagged.sum()}; certified rows n={cert.sum()} "
              f"|dll| p50={qc[0]:.3g} p99={qc[1]:.3g} max={qc[2]:.3g}",
              flush=True)


if __name__ == "__main__":
    main()
