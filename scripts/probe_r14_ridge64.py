"""Round-14 probe: does an f64-emulated solve cover the flagship ridge arm?

The POSTERIOR_r07 root cause (docs/TPU_NOTES.md round-10): at nx=128 the
f32 fast pipeline cannot solve the thin-sample (311 nm) high-fluence rows
at high mu_n — the damped Newton pins at the NEWTON_DAMP cap at EVERY
escalation rung including gold h4/refine2, so the flagship walk never
crosses mu_n ~ 30 while the reference's LSODA posterior puts 84.8% of its
mass above mu_n = 50 (reference forward_solver.py:162-178 solves the whole
prior box).

This probe evaluates the framework's likelihood at 8 oracle post-burn
ridge states (mu_n 50-97, drawn from the preserved flagship oracle chain)
under a ladder of solver configs, including XLA float64 (emulated on TPU),
against the f64 LSODA oracle ll. PASS = an affordable config with all 8
states finite and |dll| <~ 1.

Usage: JAX_PLATFORMS=<...> python scripts/probe_r14_ridge64.py
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

import posterior_compare as pc  # noqa: E402

pc.apply_preset("flagship")

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".probe_r14_ridge_states.npz")


def ridge_states():
    """8 post-burn oracle states spanning the high-mu_n ridge arm."""
    here = os.path.dirname(os.path.abspath(__file__))
    chain = None
    for n in (60000, 3600, 3200):
        for f in sorted(os.listdir(here)):
            if f.startswith(f".oracle_tmh_{n}_") and f.endswith(".npz"):
                chain = np.load(os.path.join(here, f))
                break
        if chain is not None:
            break
    assert chain is not None, "no preserved flagship oracle chain found"
    n_done = int(chain["n_done"]) if "n_done" in chain.files else \
        len(chain[pc.ACTIVE[0]])
    burn = n_done // 3
    mu = chain["mu_n"][burn:n_done]
    hi = np.nonzero(mu > 50)[0]
    assert len(hi) >= 8, f"only {len(hi)} ridge draws above mu_n=50"
    # spread over the arm: sort the high-mu draws by mu_n, take 8 evenly
    order = hi[np.argsort(mu[hi])]
    pick = order[np.linspace(0, len(order) - 1, 8).astype(int)]
    states = []
    for i in pick:
        s = dict(pc.TRUE)
        s.update({k: float(chain[k][burn + i]) for k in pc.ACTIVE})
        states.append(s)
    return states


def main():
    t, vals = pc.make_dataset()
    # f64 LSODA oracle ll (cached WITH the states it was evaluated at —
    # the source chain keeps advancing in the background)
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        ll_o = z["ll_o"]
        states = [dict(pc.TRUE, **{k: float(z[k][i]) for k in pc.ACTIVE})
                  for i in range(len(ll_o))]
        print("(oracle ll + states from cache)", flush=True)
        print("ridge states mu_n:", [f"{s['mu_n']:.1f}" for s in states],
              flush=True)
    else:
        states = ridge_states()
        print("ridge states mu_n:", [f"{s['mu_n']:.1f}" for s in states],
              flush=True)
        ll_o = np.empty(len(states))
        for i, s in enumerate(states):
            clock = time.perf_counter()
            ll_o[i] = pc.oracle_logll(t, vals, s)
            print(f"  oracle ll[{i}] = {ll_o[i]:.1f} "
                  f"({time.perf_counter() - clock:.1f} s)", flush=True)
        np.savez(CACHE, ll_o=ll_o,
                 **{k: np.array([s[k] for s in states]) for k in pc.ACTIVE})

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

    block = np.stack([[s[n] for n in pc.NAMES] for s in states])

    configs = [
        # (label, hmax, refactor, refine, dtype, backend[, h0])
        ("f32 h48/F4 (base)", 48.0, 4, 1, jnp.float32, "xla"),
        ("f32 h16/F1 (rung)", 16.0, 1, 1, jnp.float32, "xla"),
        ("f64 h48/F4 xla", 48.0, 4, 1, jnp.float64, "xla"),
        ("f64 h16/F1 xla", 16.0, 1, 1, jnp.float64, "xla"),
        ("f64 h4/F1 xla", 4.0, 1, 1, jnp.float64, "xla"),
    ]
    if "--v2" in sys.argv[1:]:  # noqa: extra legs
        # round-2 legs: the h-independent |dll|~3.7 of the v1 f64 ladder
        # must be ramp/early-time error (refine subdivides the ramp too,
        # and gold h4/refine2 measured ~1 unit in r07) — isolate it
        configs = [
            ("f64 h48/F4 r2", 48.0, 4, 2, jnp.float64, "xla"),
            ("f64 h48/F4 h0=1e-4", 48.0, 4, 1, jnp.float64, "xla", 1e-4),
            ("f64 h16/F1 r2", 16.0, 1, 2, jnp.float64, "xla"),
        ]
    if "--v3" in sys.argv[1:]:
        configs = [
            ("f64 h48/F4 h0=1e-5", 48.0, 4, 1, jnp.float64, "xla", 1e-5),
            ("f64 h48/F4 r2 h0=1e-4", 48.0, 4, 2, jnp.float64, "xla", 1e-4),
        ]
    if "--prod" in sys.argv[1:]:
        # the PRODUCTION integration: f32 Pallas base (traced through the
        # x64 scope) + inline escalation whose nx>=96 rung is the
        # f64-emulated refine-2 XLA solve (build_likelihood_plan under
        # jax_enable_x64). PASS = all 8 ridge states finite with
        # |dll| <= ~0.1 and the repair counted in esc diagnostics.
        configs = [
            ("PROD f32+f64rung", 48.0, 4, 1, jnp.float32, "auto"),
        ]
    print(f"\noracle ll: {np.array2string(ll_o, precision=1)}\n", flush=True)
    for label, hm, rf, refine, dt, bk, *rest in configs:
        prod = label.startswith("PROD")
        plan = build_likelihood_plan(
            sim_info, param_info, mcmc, e_data, iniPar, hmax=hm,
            align_outputs=False, refactor_every=rf, refine=refine,
            escalate=prod, h0=(rest[0] if rest else 1e-3))
        if prod:
            assert plan.fwd[0][2] is not None
            assert plan.fwd[0][2].solve_dtype == "float64", \
                plan.fwd[0][2].solve_dtype
        ev = jax.jit(make_eval_logll(plan, dtype=dt, backend=bk,
                                     escalate="inline" if prod else "off"))
        clock = time.perf_counter()
        out = ev(jnp.asarray(block, dt), jnp.asarray([1.0], dt))
        ll = np.asarray(out["logll_T"])[:, 0]
        resid = np.asarray(out["resid"])
        compile_s = time.perf_counter() - clock
        clock = time.perf_counter()
        out = ev(jnp.asarray(block, dt), jnp.asarray([1.0], dt))
        jax.block_until_ready(out["logll_T"])
        run_s = time.perf_counter() - clock
        d = ll - ll_o
        fin = np.isfinite(d)
        print(f"{label:22s} finite {fin.sum()}/8  "
              f"|dll| max {np.abs(d[fin]).max() if fin.any() else np.nan:9.3g}  "
              f"resid max {np.nanmax(resid):8.3g}  "
              f"[{run_s * 1e3:6.1f} ms/eval, compile {compile_s:.0f}s]",
              flush=True)
        print("   ll:", np.array2string(ll, precision=1), flush=True)
        if prod:
            score = np.asarray(out["esc_score"])
            pm_ll = np.asarray(out["per_meas"])[:, :, 0]
            for i in range(len(states)):
                print(f"   state {i} (mu_n {states[i]['mu_n']:.0f}): "
                      f"resid {np.array2string(resid[i], precision=2)} "
                      f"score {np.array2string(score[i], precision=2)} "
                      f"pm_ll {np.array2string(pm_ll[i], precision=0)}",
                      flush=True)


if __name__ == "__main__":
    main()
