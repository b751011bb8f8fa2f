"""Probe: Mosaic sublane utilization of (B, C, nx) vs (C, B, nx) layouts.

Hypothesis (pallas_guide.md tiling rules): f32 arrays tile (8, 128) on the
last two dims, so a (48, 3, 128) value uses 3/8 sublanes per elementwise op
while (3, 48, 128) tiles perfectly. If true, restructuring the solver state
to component-leading is worth ~2x+ on the VPU-bound integration kernel.

Honest timing: chained inputs (each timed call consumes the previous
call's output) + readback, per docs/TPU_NOTES.md relay-caching rules.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

B, C, NX = 48, 3, 128
ITERS = 600  # elementwise ops per kernel call


def _work(y, k):
    # representative RHS-ish elementwise mix: mul/add/sub + a shift
    a = y * 1.000001 + 0.5
    b = jnp.roll(a, 1, axis=-1)
    return y + 1e-6 * (a * b - y) + 1e-9 * k


def kernel_bcn(y_ref, o_ref):
    y = y_ref[:]
    y = jax.lax.fori_loop(0, ITERS, lambda k, y: _work(y, k), y)
    o_ref[:] = y


def run(shape, name):
    f = pl.pallas_call(
        kernel_bcn,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    y = jnp.ones(shape, jnp.float32)
    y = f(y)  # compile + warm
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        y = f(y)  # chained
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / n
    print(f"{name} {shape}: {dt*1e3:.3f} ms/call "
          f"({ITERS} fused elementwise iters)")
    return dt


if __name__ == "__main__":
    t1 = run((B, C, NX), "batch-leading ")
    t2 = run((C, B, NX), "comp-leading  ")
    print(f"speedup comp-leading: {t1 / t2:.2f}x")
