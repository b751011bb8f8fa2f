"""Escalated-pipeline validation at the production operating point
(VERDICT r4 ask #4: kill the circularity — fast-vs-gold agreement partly
validates ESCALATED solves when a large fraction of stationary states
carry them, so validate the escalated rows DIRECTLY against the f64
LSODA oracle).

Full-preset workload (6 TRPL curves, nx=32, t <= 1000 ns, 10 active
params — the docs/POSTERIOR_r08_gold.md geometry, which runs the LEGACY
f32 escalation ladder): draw ~192 post-burn states from the production
sampler's own chains, then per (state, measurement) row:

* escalate-free eval  -> pre-repair resid / static / score (flag rate);
* inline eval         -> the ll the production sampler actually uses;
* f64 LSODA oracle    -> per-row reference ll.

Reports the stationary flag rate and |dll| percentiles for REPAIRED
rows, UNFLAGGED rows, and concessions, into docs/ESC_VALIDATION_r11.md.

Usage: python scripts/esc_validation.py [n_states] [n_iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_enable_x64", True)
from metrotrpl_tpu import enable_compile_cache  # noqa: E402

enable_compile_cache()
import jax.numpy as jnp  # noqa: E402

import posterior_compare as pc  # noqa: E402

pc.apply_preset("full")

from metrotrpl_tpu.inference.likelihood import (  # noqa: E402
    build_likelihood_plan,
    make_eval_logll,
)
from metrotrpl_tpu.oracle import solve_reference  # noqa: E402

HMAX, REFACTOR = 48.0, 4


def oracle_row_ll(t, vals, state):
    """Per-measurement reference-math ll (f64 LSODA)."""
    pm = {k: v * pc.UC.get(k, 1) for k, v in state.items()}
    out = np.empty(len(pc.LENGTHS))
    for m, (L, v) in enumerate(zip(pc.LENGTHS, vals)):
        try:
            pl = solve_reference(pc._ic(m), L, pc.NX, t, pm, rhs="native")
        except Exception:
            out[m] = -np.inf
            continue
        if not np.all(np.isfinite(pl)) or np.any(pl <= 0):
            out[m] = -np.inf
            continue
        out[m] = -np.sum((np.log10(pl) - v) ** 2
                         / (pc.SIGMA ** 2 + 2 * pc.UNC ** 2))
    return out


def main():
    n_states = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    t, vals = pc.make_dataset()

    # production post-burn states from the sampler's own (REV 5) chains
    samples, acc = pc._cached_tpu_mh(t, vals, n_iters, HMAX, REFACTOR,
                                     n_chains=32)
    burn = n_iters // 3
    flat = {k: np.asarray(samples[k])[burn:].ravel() for k in pc.ACTIVE}
    idx = np.linspace(0, len(flat[pc.ACTIVE[0]]) - 1, n_states).astype(int)
    states = []
    for i in idx:
        states.append(dict(pc.TRUE,
                           **{k: float(flat[k][i]) for k in pc.ACTIVE}))
    block = np.stack([[s[n] for n in pc.NAMES] for s in states])

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
    plan = build_likelihood_plan(sim_info, param_info, mcmc, e_data, iniPar,
                                 hmax=HMAX, align_outputs=False,
                                 refactor_every=REFACTOR)
    bj = jnp.asarray(block, jnp.float32)
    temps1 = jnp.asarray([1.0], jnp.float32)
    out_off = jax.jit(make_eval_logll(plan, dtype=jnp.float32,
                                      escalate="off", eval_chunk=64))(
        bj, temps1)
    out_in = jax.jit(make_eval_logll(plan, dtype=jnp.float32,
                                     escalate="inline", eval_chunk=64))(
        bj, temps1)
    resid = np.asarray(out_off["resid"])
    pm_off = np.asarray(out_off["per_meas"])[:, :, 0]
    pm_in = np.asarray(out_in["per_meas"])[:, :, 0]
    tol = plan.newton_div_tol or 0.1
    flagged = ~(resid < tol) | ~np.isfinite(pm_off)

    # f64 oracle per-row lls (serial CPU)
    ll_o = np.empty((n_states, M))
    clock = time.perf_counter()
    for i, s in enumerate(states):
        ll_o[i] = oracle_row_ll(t, vals, s)
        if (i + 1) % 16 == 0:
            print(f"  oracle {i + 1}/{n_states} "
                  f"({(time.perf_counter() - clock) / (i + 1):.2f} s/state)",
                  flush=True)

    def q(d):
        d = d[np.isfinite(d)]
        if not len(d):
            return "— (none)"
        p = np.percentile(np.abs(d), [50, 90, 99, 100])
        return (f"p50 {p[0]:.3f}, p90 {p[1]:.3f}, p99 {p[2]:.3f}, "
                f"max {p[3]:.3f} (n={len(d)})")

    rep = flagged & np.isfinite(pm_in)      # repaired rows (used ll)
    unf = ~flagged
    conc = flagged & ~np.isfinite(pm_in)    # conceded -inf
    d_rep = (pm_in - ll_o)[rep]
    d_unf = (pm_in - ll_o)[unf]
    n_rows = flagged.size
    state_flag = flagged.any(axis=1)
    lines = [
        "# Escalated-pipeline validation at the production operating point"
        " — ESC_VALIDATION_r11",
        "",
        f"Full-preset workload (6 TRPL curves, nx={pc.NX}, t <= "
        f"{pc.T_END:.0f} ns, 10 active params,",
        f"sigma={pc.SIGMA}) — the legacy f32 escalation ladder's grid. "
        f"{n_states} post-burn states thinned",
        f"from the production sampler's own chains (32 untempered x "
        f"{n_iters}, acceptance {acc:.2f},",
        "TPU_SAMPLER_REV 5), each row (state x measurement) evaluated"
        " three ways: escalate-free",
        "(pre-repair diagnostics), inline (the ll production actually"
        " samples), and the f64 LSODA",
        "oracle (reference math, per row).",
        "",
        f"* stationary Newton-flag rate (tol {tol:g}): "
        f"**{flagged.mean():.3f}** of rows; {int(state_flag.sum())}/"
        f"{n_states} states carry >= 1 flagged row",
        f"* repaired rows (flagged, finite post-repair): "
        f"{int(rep.sum())}/{n_rows}",
        f"* conceded rows (-inf post-repair): {int(conc.sum())}/{n_rows}",
        "",
        "|dll| vs the f64 oracle (log-likelihood units; per-row scale "
        f"~{np.median(np.abs(ll_o[np.isfinite(ll_o)])):.0f}):",
        "",
        f"* REPAIRED rows (the escalated pipeline itself): {q(d_rep)}",
        f"* unflagged rows (the plain fast path): {q(d_unf)}",
        "",
        "The repaired-row error is measured DIRECTLY against reference"
        " math at the production",
        "operating point — the fast-vs-gold mean agreement"
        " (docs/POSTERIOR_r08_gold.md) no longer",
        "rests on escalated solves validating themselves"
        " (VERDICT r4 weak #2).",
        "",
        f"Reproduce: `python scripts/esc_validation.py {n_states} "
        f"{n_iters}`.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "ESC_VALIDATION_r11.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    print(f"flag rate {flagged.mean():.3f}; repaired {q(d_rep)}; "
          f"unflagged {q(d_unf)}")


if __name__ == "__main__":
    main()
