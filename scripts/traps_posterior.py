"""Traps-model fast-vs-gold posterior artifact + throughput row
(VERDICT r4 ask #6: promote traps from LL-agreement evidence to full
parity evidence — the reference treats std and traps as peers,
reference forward_solver.py:374-418).

Same workload as scripts/probe_traps_ll.py (2 TRPL curves 311/2000 nm,
nx=32, t <= 1000 ns, shallow-trap model, 13 active params incl.
kC/Nt/tauE). Two samplers, both this framework's compiled kernel:

* fast — production mode (h48/F4 f32, inline escalation, symbolic
  jac_traps_planes);
* gold — escalation-target mode (h4, refine 2, chord-free), which
  matches the f64 LSODA traps oracle pointwise to |dll| p50 0.042
  (probe_traps_ll, docs/TPU_NOTES.md round-10).

Writes docs/POSTERIOR_r10_traps.md with the per-parameter z-table and a
measured traps walker-steps/s throughput row.

Usage: python scripts/traps_posterior.py [n_iters] [n_chains]
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

import probe_traps_ll as T  # noqa: E402  (workload constants + oracle)
from posterior_compare import ess_log10  # noqa: E402

from metrotrpl_tpu.inference.likelihood import build_likelihood_plan  # noqa: E402
from metrotrpl_tpu.inference.metropolis import build_mh_kernel  # noqa: E402
from metrotrpl_tpu.inference.moves import build_move_plan  # noqa: E402
from metrotrpl_tpu.oracle import solve_reference  # noqa: E402

WIDTH = 0.01
PRIOR = {n: (T.TRUE[n] * 1e-3, T.TRUE[n] * 1e3) for n in T.NAMES}


def make_dataset():
    t = np.linspace(0, T.T_END, T.NT)
    pm = T._pm(T.TRUE)
    rng = np.random.default_rng(T.SEED)
    vals = []
    for m, L in enumerate(T.LENGTHS):
        pl = solve_reference(T._ic(m), L, T.NX, t, pm, model="traps")
        vals.append(np.log10(pl) + rng.normal(0, T.UNC, T.NT))
    return t, vals


def run_chain(t, vals, n_iters, n_chains, hmax, refactor, refine,
              label):
    param_info = {
        "names": T.NAMES,
        "unit_conversions": dict(T.STAUB_UC),
        "do_log": {n: 1 for n in T.NAMES},
        "active": {n: int(n in T.ACTIVE) for n in T.NAMES},
        "init_guess": dict(T.TRUE),
        "prior_dist": PRIOR,
        "trial_move": {n: WIDTH for n in T.NAMES},
    }
    M = len(T.LENGTHS)
    sim_info = {"lengths": T.LENGTHS, "nx": [T.NX] * M,
                "meas_types": ["TRPL"] * M, "num_meas": M}
    mcmc = {"ini_mode": "fluence", "model": "traps", "log_y": 1,
            "model_uncertainty": T.SIGMA, "hard_bounds": 1}
    iniPar = np.array([[f, a, 1] for f, a in T.FLU])
    e_data = ([t] * M, vals, [np.full(T.NT, T.UNC)] * M)
    plan = build_likelihood_plan(
        sim_info, param_info, mcmc, e_data, iniPar, hmax=hmax,
        align_outputs=False, refactor_every=refactor, refine=refine)
    mp = build_move_plan(param_info, mcmc)
    base_move = np.array([WIDTH if n in T.ACTIVE else 0.0
                          for n in T.NAMES])
    window = min(500, n_iters)
    kern = build_mh_kernel(plan, mp, np.ones(n_chains), base_move,
                           temper_freq=10, do_tempering=False,
                           window=window, dtype=jnp.float32,
                           escalate="inline", backend="auto")
    states = jnp.asarray(np.tile([T.TRUE[n] for n in T.NAMES],
                                 (n_chains, 1)), jnp.float32)
    ll = jax.block_until_ready(kern.init_ll(states))
    hist_states, hist_accept = [], []
    k = 0
    key = jax.random.PRNGKey(T.SEED)
    clock = None
    steps_per_sec = None
    while k < n_iters:
        out = kern.run_window(states, ll, jnp.asarray(k), key)
        states, ll, _, _, _, hist = out
        jax.block_until_ready(states)
        if clock is None:
            clock = time.perf_counter()   # exclude compile window
            t0_k = k + window
        hist_states.append(np.asarray(hist[0]))
        hist_accept.append(np.asarray(hist[2]))
        k += window
        el = time.perf_counter() - clock
        if k > t0_k and el > 0:
            steps_per_sec = n_chains * (k - t0_k) / el
        print(f"  {label} {k}/{n_iters}"
              + (f" ({steps_per_sec:.0f} walker-steps/s)"
                 if steps_per_sec else ""), flush=True)
    h = np.concatenate(hist_states, axis=0)[:n_iters]
    acc = np.concatenate(hist_accept, axis=0)[:n_iters]
    samples = {p: h[:, :, T.NAMES.index(p)] for p in T.ACTIVE}
    return samples, float(acc.mean()), steps_per_sec


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    t, vals = make_dataset()
    fast, acc_f, sps_f = run_chain(t, vals, n_iters, n_chains, 48.0, 4, 1,
                                   "fast")
    gold, acc_g, sps_g = run_chain(t, vals, n_iters, n_chains, 4.0, 1, 2,
                                   "gold")
    burn = n_iters // 3
    lines = [
        "# Traps-model fast-vs-gold posterior agreement — POSTERIOR_r10_traps",
        "",
        "Both samplers are this framework's compiled kernel on the same"
        " noisy synthetic",
        f"dataset (2 TRPL curves 311/2000 nm, nx={T.NX}, t <= "
        f"{T.T_END:.0f} ns, SHALLOW-TRAP model,",
        f"{len(T.ACTIVE)} active params incl. kC/Nt/tauE, noise "
        f"sigma={T.UNC}), {n_chains} untempered",
        f"chains x {n_iters} iterations, burn-in {burn}:",
        "",
        f"* **fast** — production mode (h48/F4 f32, symbolic traps "
        f"Jacobian), acceptance {acc_f:.2f},",
        f"  measured **{sps_f:.0f} walker-steps/s** (the traps "
        "throughput row; same kernel class as the",
        "  std bench headline).",
        f"* **gold** — escalation-target mode (h4, refine 2, "
        f"chord-free), acceptance {acc_g:.2f},",
        f"  {sps_g:.0f} walker-steps/s; matches the f64 LSODA traps "
        "oracle pointwise to |dll| p50",
        "  0.042 / p99 0.81 at 96 ball states (probe_traps_ll,"
        " docs/TPU_NOTES.md round-10), so",
        "  fast==gold here + gold==oracle pointwise bounds the traps"
        " fast-mode posterior bias.",
        "",
        "| param | truth | gold mean +/- sigma (ESS) | "
        "fast mean +/- sigma (ESS) | |z| | |z_mc| |",
        "|---|---|---|---|---|---|",
    ]
    worst = worst_mc = 0.0
    for p in T.ACTIVE:
        sg, sf = gold[p][burn:], fast[p][burn:]
        lg, lf = np.log10(sg.ravel()), np.log10(sf.ravel())
        mg, s_g = lg.mean(), lg.std()
        mf, s_f = lf.mean(), lf.std()
        essg, essf = ess_log10(sg), ess_log10(sf)
        z = abs(mg - mf) / max(np.hypot(s_g, s_f), 1e-12)
        z_mc = abs(mg - mf) / max(np.sqrt(
            s_g ** 2 + s_f ** 2 + s_g ** 2 / essg + s_f ** 2 / essf),
            1e-12)
        worst, worst_mc = max(worst, z), max(worst_mc, z_mc)
        lines.append(
            f"| {p} | {T.TRUE[p]:g} | 10^({mg:.4f} +/- {s_g:.4f}) "
            f"({essg:.0f}) | 10^({mf:.4f} +/- {s_f:.4f}) ({essf:.0f}) "
            f"| {z:.2f} | {z_mc:.2f} |")
    lines += [
        "",
        f"Largest |z|: **{worst:.2f}**; largest MC-error-aware |z_mc|: "
        f"**{worst_mc:.2f}** — the traps fast",
        "mode's posterior means agree with gold within "
        + ("their posterior uncertainty." if worst < 1
           else "threshold EXCEEDED."),
        "",
        f"Reproduce: `python scripts/traps_posterior.py {n_iters} "
        f"{n_chains}`.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "POSTERIOR_r10_traps.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; worst |z| {worst:.2f} / |z_mc| {worst_mc:.2f}")


if __name__ == "__main__":
    main()
