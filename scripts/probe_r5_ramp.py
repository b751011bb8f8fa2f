"""Round-5 probe: ramp aggressiveness vs accuracy.

At the bench config (hmax=48, refactor_every=4) the geometric dt ramp
(h0=1e-3, growth=1.25) is 50 of 86 steps and refactorizes EVERY step —
~70% of the per-solve work covers the first ~2 ns of a 2000 ns decay.
This probe measures max |dlog10 PL| vs the float64 LSODA oracle for more
aggressive ramps (growth up to 2.0, h0 up to 1e-2) on both staub
thicknesses, f64 stacked layout (pure scheme accuracy, no f32 effects).

Run: JAX_PLATFORMS=cpu python scripts/probe_r5_ramp.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from metrotrpl_tpu.physics.models import beer_lambert  # noqa: E402
from metrotrpl_tpu.solver.forward import (  # noqa: E402
    make_forward_plan,
    solve_forward_batch,
)
from metrotrpl_tpu.workloads import STAUB_TRUE, STAUB_UC  # noqa: E402


def main():
    nx, nt = 128, 501
    t = np.linspace(0, 2000, nt)
    raw = {k: jnp.asarray([v * STAUB_UC.get(k, 1)])
           for k, v in STAUB_TRUE.items()}

    from metrotrpl_tpu.oracle import solve_reference
    pm = {k: float(v[0]) for k, v in raw.items()}

    for th in (311.0, 2000.0):
        dx = th / nx
        x = np.linspace(dx / 2, th - dx / 2, nx)
        ic = beer_lambert(2.12e11 * 1e-14, 6e4 * 1e-7, jnp.asarray(x))[None]
        ref = solve_reference(np.asarray(ic[0]), th, nx, t, pm)
        lref = np.log10(ref)
        print(f"--- thickness {th} nm ---", flush=True)
        for h0 in (1e-3, 1e-2):
            for growth in (1.25, 1.5, 2.0):
                fp = make_forward_plan(
                    [th], [nx], ["TRPL"], [t], hmax=48.0, scheme="sdirk3",
                    newton_iters=2, h0=h0, growth=growth,
                    align_outputs=False, refactor_every=4)
                sol = solve_forward_batch(
                    ic, raw, jnp.asarray(fp.dx), jnp.asarray(fp.dt),
                    jnp.asarray(fp.out_idx), jnp.asarray(fp.is_trpl),
                    model="std", scheme="sdirk3", newton_iters=2,
                    backend="xla", layout="stacked",
                    out_w=jnp.asarray(fp.out_w),
                    refactor_every=fp.refactor_every, n_ramp=fp.n_ramp)
                s = np.asarray(sol[0])
                err = np.max(np.abs(np.log10(np.abs(s)) - lref))
                print(f"h0={h0:g} growth={growth:<4} n_steps={fp.n_steps:3d}"
                      f" n_ramp={fp.n_ramp} max|dlog10 PL|={err:.2e}",
                      flush=True)


if __name__ == "__main__":
    main()
