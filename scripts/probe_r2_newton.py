"""Probe: cheaper stepping configs — fewer Newton iterations / 2nd-order
scheme — accuracy vs the LSODA oracle and TPU eval time.

Two parts:
* ``accuracy``: CPU float64, solve_single per config vs solve_reference on
  the staub workload (both thicknesses), reporting max |dlog10 PL|.
* ``speed`` (default, needs TPU): eval-time at B=48 per config, honest
  timing (chained inputs + readback, docs/TPU_NOTES.md).

Usage: python scripts/probe_r2_newton.py [accuracy|speed]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

TRUE = {"n0": 1e8, "p0": 3e15, "mu_n": 20, "mu_p": 20, "ks": 4.8e-11,
        "Cn": 4.4e-29, "Cp": 4.4e-29, "Sf": 10, "Sb": 10,
        "tauN": 511, "tauP": 871, "eps": 10, "Tm": 300}
UC = {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5, "mu_p": 1e5, "ks": 1e12,
      "Cn": 1e33, "Cp": 1e33, "Sf": 1e-2, "Sb": 1e-2}

CONFIGS = [
    # label, scheme, newton_iters, hmax
    ("sdirk3 N2 h16 (current)", "sdirk3", 2, 16.0),
    ("sdirk3 N1 h16", "sdirk3", 1, 16.0),
    ("trbdf2 N2 h16", "trbdf2", 2, 16.0),
    ("trbdf2 N1 h16", "trbdf2", 1, 16.0),
    ("sdirk3 N1 h8", "sdirk3", 1, 8.0),
    ("sdirk3 N2 h24", "sdirk3", 2, 24.0),
    ("sdirk3 N2 h32", "sdirk3", 2, 32.0),
]


def accuracy():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

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
        for label, scheme, ni, hm in CONFIGS:
            mine = solve_single(ic, pm, L, nx, t, scheme=scheme,
                                newton_iters=ni, hmax=hm,
                                align_outputs=False, dtype=jnp.float64)
            err = np.max(np.abs(np.log10(np.maximum(mine, 1e-300)) - ref))
            print(f"  {label:26s} max|dlog10| = {err:.2e}", flush=True)


def speed():
    import jax
    import jax.numpy as jnp

    from probe_r2_perf import build_eval, timeit

    print(f"device: {jax.devices()[0]}")
    for label, scheme, ni, hm in CONFIGS:
        try:
            ev, states, temps, plan = build_eval(
                8, "xla", 16, hmax=hm, align_outputs=False, scheme=scheme,
                newton_iters=ni)
            n_steps = plan.fwd[0][1].n_steps
            dt, val = timeit(ev, states, temps)
            print(f"{label:26s} n_steps={n_steps:4d} eval={dt*1e3:8.2f} ms "
                  f"ll={val:.6e}", flush=True)
        except Exception as e:
            print(f"{label:26s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/scripts")
    if len(sys.argv) > 1 and sys.argv[1] == "accuracy":
        accuracy()
    else:
        speed()
