"""Round-16 probe: map f32 fast-solver reliability over the prior box at
nx=128 and test whether a deterministic STIFFNESS functional of
(state, measurement) separates wrong rows from clean ones.

Round-15 finding: at flagship ridge states the f32 fast solve can be
decades-wrong with resid BELOW tolerance (sub-cap false negatives), so
the Newton-residual predicate cannot patrol the stiff region. The
failure class is structural — thin sample x high fluence x high
mobility — which is computable from the state BEFORE solving:

    S(state, m) = mu_max * ns_m / dx_m        (drift-feedback coupling)

with ns_m the row's density scale (peak Beer-Lambert dN + p0) and
dx_m = thickness_m / nx. This probe draws prior-box states (the
tempered hot-chain habitat) + oracle ridge states, evaluates f32 fast
(h48/F4), f32 gold (h4/r2), and f64 fast-r2, and reports:

1. |dll| (f32 fast vs f64) and (f32 gold vs f64) per row;
2. whether S separates |dll_row| > 1 rows from clean rows (threshold
   sweep -> false-negative / false-positive counts);
3. what fraction of prior-box rows exceed the S threshold (the fused
   always-pay rate for a stiffness-gated f64 rung).

Usage: python scripts/probe_r16_stiffmap.py [n_states]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
from metrotrpl_tpu import enable_compile_cache  # noqa: E402
enable_compile_cache()
import jax.numpy as jnp  # noqa: E402

import posterior_compare as pc  # noqa: E402

pc.apply_preset("flagship")


def main():
    n_states = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    t, vals = pc.make_dataset()

    rng = np.random.default_rng(20260820)
    # prior-box draws on the ACTIVE params (log-uniform = the tempered
    # hot-chain habitat at high T), truth for inactive
    states = []
    for _ in range(n_states):
        s = dict(pc.TRUE)
        for k in pc.ACTIVE:
            lo, hi = pc.PRIOR[k]
            s[k] = 10 ** rng.uniform(np.log10(lo), np.log10(hi))
        if s.get("p0", 1e99) <= s.get("n0", 0):
            s["p0"] = s["n0"] * 10
        # tn/tp support constraint (approve_move parity)
        if abs(np.log10(s["tauN"]) - np.log10(s["tauP"])) > 2:
            s["tauP"] = s["tauN"]
        states.append(s)
    # plus the 8 cached oracle ridge states (the known failure class)
    z = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".probe_r14_ridge_states.npz"))
    for i in range(len(z["ll_o"])):
        states.append(dict(pc.TRUE, **{k: float(z[k][i]) for k in pc.ACTIVE}))
    S = len(states)

    from metrotrpl_tpu.inference.likelihood import (
        build_likelihood_plan,
        make_eval_logll,
    )

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
    block_np = np.stack([[s[n] for n in pc.NAMES] for s in states])

    def run_eval(hm, rf, refine, dt, bk):
        plan = build_likelihood_plan(
            sim_info, param_info, mcmc, e_data, iniPar, hmax=hm,
            align_outputs=False, refactor_every=rf, refine=refine,
            escalate=False)
        ev = jax.jit(make_eval_logll(plan, dtype=dt, backend=bk,
                                     escalate="off", eval_chunk=32))
        out = ev(jnp.asarray(block_np, dt), jnp.asarray([1.0], dt))
        return (np.asarray(out["per_meas"])[:, :, 0],
                np.asarray(out["resid"]),
                np.asarray(out["esc_score"]))

    print(f"{S} states (last 8 = oracle ridge)", flush=True)
    pm64, r64, _ = run_eval(48.0, 4, 2, jnp.float64, "xla")
    print("f64 fast-r2 done", flush=True)
    pm32, r32, sc32 = run_eval(48.0, 4, 1, jnp.float32, "auto")
    print("f32 fast done", flush=True)
    pmg, rg, _ = run_eval(4.0, 1, 2, jnp.float32, "auto")
    print("f32 gold done", flush=True)

    # stiffness functional per (state, m)
    mu_max = np.maximum(block_np[:, pc.NAMES.index("mu_n")],
                        block_np[:, pc.NAMES.index("mu_p")])  # entry units
    lengths = np.array(pc.LENGTHS)
    dx = lengths / pc.NX
    flu = np.array([f for f, a in pc.FLU])
    absp = np.array([a for f, a in pc.FLU])
    p0 = block_np[:, pc.NAMES.index("p0")] * pc.UC["p0"]  # model units
    peak = flu * 1e-14 * absp * 1e-7                      # nm^-3 peak dN
    ns = peak[None, :] + p0[:, None]
    Sf_ = (mu_max[:, None] * pc.UC["mu_n"]) * ns / dx[None, :]

    dll32 = np.abs(pm32 - pm64)
    dllg = np.abs(pmg - pm64)
    both_inf = ~np.isfinite(pm32) & ~np.isfinite(pm64)
    dll32 = np.where(both_inf, 0.0, dll32)
    dll32 = np.where(np.isfinite(dll32), dll32, np.inf)
    dllg = np.where(~np.isfinite(pmg) & ~np.isfinite(pm64), 0.0, dllg)
    dllg = np.where(np.isfinite(dllg), dllg, np.inf)

    wrong32 = dll32 > 1.0
    wrongg = dllg > 1.0
    n_rows = wrong32.size
    print(f"\nf32 fast wrong rows (|dll|>1 vs f64): {wrong32.sum()}/{n_rows}"
          f"  (gold wrong: {wrongg.sum()}/{n_rows})")
    flag = ~(r32 < 1.0)
    print(f"resid predicate (tol 1.0) catches {int((wrong32 & flag).sum())}"
          f"/{int(wrong32.sum())} wrong rows; false-neg "
          f"{int((wrong32 & ~flag).sum())}")

    # S threshold sweep
    print("\nS-threshold sweep (rows with S > thresh escalate):")
    print("thresh      FN(wrong,unflagged)  fire-rate  fire-rate(prior only)")
    prior_rows = np.ones(S, bool)
    prior_rows[-8:] = False
    for thr in (10.0 ** np.arange(2, 8, 0.5)):
        fire = Sf_ > thr
        fn = int((wrong32 & ~fire).sum())
        print(f"  {thr:9.3g}  {fn:4d}  {fire.mean():9.3f}  "
              f"{fire[prior_rows].mean():9.3f}")
    # where do the wrong rows sit in S?
    if wrong32.any():
        sw = np.sort(Sf_[wrong32])
        sc = np.sort(Sf_[~wrong32 & np.isfinite(Sf_)])
        print(f"\nS of wrong rows:  min {sw[0]:.3g} p10 "
              f"{sw[int(0.1 * len(sw))]:.3g} p50 {sw[len(sw) // 2]:.3g}")
        print(f"S of clean rows:  p50 {sc[len(sc) // 2]:.3g} p90 "
              f"{sc[int(0.9 * len(sc))]:.3g} max {sc[-1]:.3g}")
    # gold-wrong rows: does S cover them too?
    if wrongg.any():
        print(f"gold-wrong rows S: min {np.sort(Sf_[wrongg])[0]:.3g} "
              f"(count {wrongg.sum()})")
    np.savez("/tmp/probe_r16_data.npz", block=block_np, pm32=pm32,
             pm64=pm64, pmg=pmg, r32=r32, rg=rg, sc32=sc32, S=Sf_)


if __name__ == "__main__":
    main()
