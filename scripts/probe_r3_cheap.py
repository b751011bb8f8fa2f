"""TPU probe: are the cheaper stepping configs f32-stable AFTER the
antisymmetric state split (commit 859c471)?

The round-2 finding that newton_iters=1 / trbdf2 / hmax>=24 return -inf on
the staub 48-row f32 batch (docs/TPU_NOTES.md "Cheaper stepping configs")
was measured BEFORE the antisymmetric split removed the Jn+Jp catastrophic
cancellation. This probe re-runs those configs on the final kernel form:
for each config, evaluate the full staub likelihood at TRUE params and at
a chain of perturbed states (honest relay-safe inputs), and compare
against the sdirk3-N2-h16 baseline ll at the SAME states.

Stable = all lls finite and |dll| within tol of baseline. Also reports
eval time (informational — re-time on an idle host before quoting).

Usage: python scripts/probe_r3_cheap.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from probe_r2_perf import build_eval

CONFIGS = [
    # label, scheme, newton_iters, hmax
    ("sdirk3 N2 h16 (baseline)", "sdirk3", 2, 16.0),
    ("sdirk3 N1 h16", "sdirk3", 1, 16.0),
    ("trbdf2 N2 h16", "trbdf2", 2, 16.0),
    ("trbdf2 N1 h16", "trbdf2", 1, 16.0),
    ("sdirk3 N2 h24", "sdirk3", 2, 24.0),
    ("sdirk3 N2 h32", "sdirk3", 2, 32.0),
    ("sdirk3 N2 h48", "sdirk3", 2, 48.0),
    ("trbdf2 N2 h24", "trbdf2", 2, 24.0),
    ("trbdf2 N2 h32", "trbdf2", 2, 32.0),
]
N_STATES = 6


def lls_at_chain(ev, states, temps):
    """Evaluate at a chain of perturbed states; returns (lls, sec/eval)."""
    out = ev(states, temps)
    jax.block_until_ready(out["logll_T"])  # compile
    lls = []
    t0 = time.perf_counter()
    for i in range(N_STATES):
        ll = float(np.asarray(out["logll_T"])[0, 0])
        lls.append(ll)
        # chain inputs from outputs (relay cache) + deterministic spread
        shift = 1.0 + 1e-3 * np.tanh(ll) * (1 + 0.1 * i)
        states = states * shift
        out = ev(states, temps)
    # read the LAST eval back inside the timed window, else the timer
    # covers only N_STATES-1 completions and under-reports ~1/N_STATES
    lls.append(float(np.asarray(out["logll_T"])[0, 0]))
    dt = (time.perf_counter() - t0) / N_STATES
    return np.array(lls), dt


ACC_CONFIGS = [
    ("sdirk3 N2 h16 (current)", "sdirk3", 2, 16.0),
    ("sdirk3 N2 h24", "sdirk3", 2, 24.0),
    ("sdirk3 N2 h32", "sdirk3", 2, 32.0),
    ("sdirk3 N2 h48", "sdirk3", 2, 48.0),
    ("trbdf2 N2 h16", "trbdf2", 2, 16.0),
    ("trbdf2 N2 h24", "trbdf2", 2, 24.0),
    ("trbdf2 N2 h32", "trbdf2", 2, 32.0),
]


def accuracy():
    """CPU f64 accuracy vs the LSODA oracle for the candidate combos,
    both staub thicknesses (like probe_r2_newton accuracy, plus the
    trbdf2/h-combo grid)."""
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from probe_r2_perf import TRUE, UC

    from metrotrpl_tpu.oracle import solve_reference
    from metrotrpl_tpu.oracle.scipy_reference import beer_lambert
    from metrotrpl_tpu.solver.forward import solve_single

    pm = {k: v * UC.get(k, 1) for k, v in TRUE.items()}
    t = np.linspace(0, 2000, 501)
    nx = 128
    for L in (311.0, 2000.0):
        dx = L / nx
        x = np.linspace(dx / 2, L - dx / 2, nx)
        ic = beer_lambert(2.12e11 * 1e-14, 6e4 * 1e-7, x)
        ref = np.log10(solve_reference(ic, L, nx, t, pm))
        print(f"thickness {L} nm:")
        for label, scheme, ni, hm in ACC_CONFIGS:
            mine = solve_single(ic, pm, L, nx, t, scheme=scheme,
                                newton_iters=ni, hmax=hm,
                                align_outputs=False, dtype=jnp.float64)
            err = np.max(np.abs(np.log10(np.maximum(mine, 1e-300)) - ref))
            print(f"  {label:24s} max|dlog10| = {err:.2e}", flush=True)


def main():
    print(f"device: {jax.devices()[0]}")
    base_lls = None
    for label, scheme, ni, hm in CONFIGS:
        try:
            ev, states, temps, plan = build_eval(
                8, "pallas", 48, hmax=hm, align_outputs=False,
                scheme=scheme, newton_iters=ni)
            n_steps = plan.fwd[0][1].n_steps
            lls, dt = lls_at_chain(ev, states, temps)
            if base_lls is None:
                base_lls = lls
                rel = 0.0
            else:
                rel = float(np.max(np.abs(lls - base_lls)
                                   / np.abs(base_lls)))
            ok = np.isfinite(lls).all()
            print(f"{label:26s} n_steps={n_steps:4d} eval={dt*1e3:8.2f} ms "
                  f"finite={ok} max_rel_dll={rel:.3e} ll0={lls[0]:.6e}",
                  flush=True)
        except Exception as e:
            print(f"{label:26s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "accuracy":
        accuracy()
    else:
        main()
