"""Probe: stepped-geometric tail schedules (tail_growth) — step count and
CPU-float64 accuracy vs the LSODA oracle on the staub workload.

Motivation (docs/TPU_NOTES.md round-3): at hmax=48 the 2000 nm error is
ramp/interp-dominated and h-INDEPENDENT — the constant-h tail over-resolves
the lengthening decay timescale. Growing h past hmax (once per tail_block
steps) should cut the tail step count with little accuracy cost.

Usage: python scripts/probe_r4_tail.py            # accuracy (CPU f64)
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

TRUE = {"n0": 1e8, "p0": 3e15, "mu_n": 20, "mu_p": 20, "ks": 4.8e-11,
        "Cn": 4.4e-29, "Cp": 4.4e-29, "Sf": 10, "Sb": 10,
        "tauN": 511, "tauP": 871, "eps": 10, "Tm": 300}
UC = {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5, "mu_p": 1e5, "ks": 1e12,
      "Cn": 1e33, "Cp": 1e33, "Sf": 1e-2, "Sb": 1e-2}

CONFIGS = [
    # label, hmax, growth, tail_growth, tail_block
    ("h48 flat (current default)", 48.0, 1.25, 1.0, 1),
    ("h48 tg1.1 tb1", 48.0, 1.25, 1.1, 1),
    ("h48 tg1.25 tb1", 48.0, 1.25, 1.25, 1),
    ("h48 tg1.5 tb1", 48.0, 1.25, 1.5, 1),
    ("h48 tg2.0 tb1", 48.0, 1.25, 2.0, 1),
    ("h48 tg1.5 tb4", 48.0, 1.25, 1.5, 4),
    ("h48 tg2.0 tb4", 48.0, 1.25, 2.0, 4),
    ("h24 tg1.25 tb1", 24.0, 1.25, 1.25, 1),
    ("h24 tg1.5 tb4", 24.0, 1.25, 1.5, 4),
    ("h48 g1.5 flat", 48.0, 1.5, 1.0, 1),
    ("h48 g1.5 tg1.25 tb1", 48.0, 1.5, 1.25, 1),
    ("h48 g1.5 tg1.5 tb4", 48.0, 1.5, 1.5, 4),
    ("h48 g1.8 tg1.5 tb4", 48.0, 1.8, 1.5, 4),
]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from metrotrpl_tpu.oracle import solve_reference
    from metrotrpl_tpu.oracle.scipy_reference import beer_lambert
    from metrotrpl_tpu.physics.grid import plan_time_grid
    from metrotrpl_tpu.solver.forward import solve_single

    pm = {k: v * UC.get(k, 1) for k, v in TRUE.items()}
    t = np.linspace(0, 2000, 501)
    nx = 128

    refs = {}
    for L in (311.0, 2000.0):
        dx = L / nx
        x = np.linspace(dx / 2, L - dx / 2, nx)
        ic = beer_lambert(2.12e11 * 1e-14, 6e4 * 1e-7, x)
        refs[L] = (ic, np.log10(solve_reference(ic, L, nx, t, pm)))

    print(f"{'config':28s} {'steps':>5s} {'311nm':>9s} {'2000nm':>9s}")
    for label, hm, g, tg, tb in CONFIGS:
        tgrid = plan_time_grid(t, hmax=hm, growth=g, align_outputs=False,
                               tail_growth=tg, tail_block=tb)
        errs = []
        for L in (311.0, 2000.0):
            ic, ref = refs[L]
            mine = solve_single(ic, pm, L, nx, t, hmax=hm, growth=g,
                                align_outputs=False, tail_growth=tg,
                                tail_block=tb, dtype=jnp.float64)
            errs.append(np.max(np.abs(
                np.log10(np.maximum(mine, 1e-300)) - ref)))
        print(f"{label:28s} {len(tgrid.dt):5d} {errs[0]:9.2e} {errs[1]:9.2e}",
              flush=True)


if __name__ == "__main__":
    main()
