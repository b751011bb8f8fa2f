"""Pallas TPU kernel: the entire SDIRK time integration fused in VMEM.

The XLA path dispatches ~10^3 small vector ops per time step (Jacobian JVPs,
PCR sweeps, Newton updates) — op overhead dominates below batch ~128, and
materialized PCR factors (~64 KB/simulation) spill VMEM above it. This
kernel runs the FULL integration (all steps, all stages, all Newton
iterations) inside one ``pallas_call``: the state, blocks, and factors never
leave VMEM, per-step observables stream to the output, and the batch is
tiled over the grid.

The kernel body reuses the library's pure-jnp physics (``rhs_std`` /
``rhs_traps``), colored-JVP Jacobian, and PCR machinery (``sdirk_factors`` /
``sdirk_stages``) — Pallas traces the same code onto VMEM values, so the
numerics are identical to the XLA path by construction (tested against it,
bit-exact in interpret mode).

Chord (stale-Jacobian) mode: steps [0, n_ramp) factor the Newton matrix
every step; past n_ramp every row's dt is constant (make_forward_plan
contract) and blocks of ``refactor_every`` steps share one factorization —
the dominant per-step cost (Jacobian JVPs + PCR elimination) drops by the
block length.

Tiling: per-tile arrays are batch-major (tile, ...) with (sublane, lane)
pairs of (block_b, nx) or (block_b, full-time-axis) to satisfy the Mosaic
(8, 128)-divisibility rules.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metrotrpl_tpu.physics.models import (
    JAC_PLANES,
    N_COMP,
    RHS_PLANES,
    ScaledParams,
    observables_planes,
)
from metrotrpl_tpu.solver.sdirk import SDIRK_SCHEMES, sdirk_factors, sdirk_stages

N_PARAM_FIELDS = len(ScaledParams._fields)


def _solve_kernel(dt_ref, y0_ref, par_ref, dx_ref, pl_ref, tr_ref, rs_ref, *,
                  model, scheme_name, newton_iters, n_steps, n_ramp,
                  refactor_every, ramp_block=1, newton_plateau=None):
    """Kernel: integrate one batch tile through all steps.

    dt_ref    (Bt, n_steps)    per-step sizes
    y0_ref    (C, Bt, nx)      initial scaled state
    par_ref   (Bt, NP)         stacked ScaledParams fields
    dx_ref    (Bt, 4)          cell sizes in col 0 (cols 1-3 zero pad:
                               the lane-4 block shape is the one this
                               kernel has always lowered through Mosaic)
    pl_ref    (Bt, n_steps+1)  scaled TRPL observable per knot (out)
    tr_ref    (Bt, n_steps+1)  scaled TRTS observable per knot (out)
    rs_ref    (Bt, n_steps+1)  Newton-convergence residual per knot (out):
                               max |last Newton update| over the step's
                               implicit stages (solver/sdirk.py
                               _maxabs_update). Streamed per knot so the
                               caller can mask padded-tail steps past a
                               row's real window before reducing.
    """
    scheme = SDIRK_SCHEMES[scheme_name]
    par = par_ref[:]                       # (Bt, NP)
    fields = [par[:, i][:, None] for i in range(N_PARAM_FIELDS)]
    p = ScaledParams(*fields)
    rhs_fn = RHS_PLANES[model]
    rhs = lambda y: rhs_fn(y, p)
    # symbolic block-tridiagonal Jacobian when the model has one (std):
    # ~100 plane-ops per factorization vs ~900 for 9 colored RHS JVPs
    jac_fn = JAC_PLANES.get(model)
    jac = (lambda y: jac_fn(y, p)) if jac_fn is not None else None

    dxv = dx_ref[:][:, 0]

    # state as a tuple of (Bt, nx) planes: every value in the step loop is
    # a fully tiled (sublane=Bt, lane=nx) array — a stacked (Bt, C, nx)
    # layout would pad C=3 -> 8 sublanes on every op (2.67x VPU/VMEM waste;
    # ops/blocktridiag.py layout note)
    C = N_COMP[model]
    y = tuple(y0_ref[c, :, :] for c in range(C))
    dt_all = dt_ref[:]                     # (Bt, n_steps)
    dtype = y[0].dtype

    # Mosaic cannot lower dynamic lane-dimension slicing at arbitrary k,
    # so: (a) per-step dt is extracted with a one-hot mask + reduction,
    # (b) observables accumulate in loop-carried values written back once.
    step_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_steps), 1)
    out_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_steps + 1), 1)

    def dt_at(k):
        return jnp.sum(dt_all * (step_iota == k).astype(dtype), axis=1)

    def observed(y, k):
        # shared observable math (physics.models) — the diff coefficients
        # come straight from p, so the kernel cannot drift from the
        # op-graph backend
        pl_col, tr_col = observables_planes(y, p, dxv, model)
        # select, NOT multiply-by-mask: a post-decay step whose state has
        # blown up in f32 (tail past the min_y clamp — masked by design in
        # the full solve path) yields a NaN column, and NaN * 0 = NaN
        # would poison EVERY knot of the accumulator including t=0. The
        # select confines it to its own knot, matching lax.scan semantics.
        sel = out_iota == k                          # (1, n_steps+1)
        zero = jnp.zeros((), dtype)
        return (jnp.where(sel, pl_col[:, None], zero),
                jnp.where(sel, tr_col[:, None], zero))

    pl0, tr0 = observed(y, 0)
    rs0 = jnp.zeros_like(pl0)

    n_phase1 = n_steps if n_ramp is None else n_ramp

    def make_block_body(k_base, F, ni):
        # One factorization per F-step block; dt is constant within each
        # block by the plan contract (F=1 degenerates to per-step
        # refactorization — the plain non-chord stepper). ni = Newton
        # iterations per stage for this phase (plateau may use fewer).
        def body(b, carry):
            y, pl_acc, tr_acc, rs_acc = carry
            k0 = k_base + b * F
            h = dt_at(k0)
            factors = sdirk_factors(rhs, y, h, scheme, jac=jac)
            for i in range(F):
                y, r = sdirk_stages(rhs, y, h, scheme, factors, ni,
                                    with_resid=True)
                d_pl, d_tr = observed(y, k0 + i + 1)
                pl_acc = pl_acc + d_pl
                tr_acc = tr_acc + d_tr
                sel = out_iota == (k0 + i + 1)
                rs_acc = rs_acc + jnp.where(sel, r[:, None],
                                            jnp.zeros((), dtype))
            return y, pl_acc, tr_acc, rs_acc
        return body

    # int32 loop bounds: under jax_enable_x64 python-int bounds make the
    # fori index int64, which promotes the iota comparisons in the body to
    # int64 — and BOTH the promotion and any corrective int64->int32 cast
    # are conversions Mosaic cannot lower (infinite recursion in its
    # convert_element_type rule). Step counts are << 2^31 by construction.
    i32 = jnp.int32
    R = int(ramp_block) if n_ramp is not None else 1
    y, pl_acc, tr_acc, rs_acc = jax.lax.fori_loop(
        i32(0), i32(n_phase1 // R), make_block_body(0, R, newton_iters),
        (y, pl0, tr0, rs0), unroll=False)

    if n_ramp is not None and n_ramp < n_steps:
        F = int(refactor_every)
        ni_p = newton_iters if newton_plateau is None else int(newton_plateau)
        y, pl_acc, tr_acc, rs_acc = jax.lax.fori_loop(
            i32(0), i32((n_steps - n_ramp) // F),
            make_block_body(n_ramp, F, ni_p),
            (y, pl_acc, tr_acc, rs_acc), unroll=False)

    pl_ref[:] = pl_acc
    tr_ref[:] = tr_acc
    rs_ref[:] = rs_acc


def integrate_observables_pallas(params, y0, dts, dx, model="std",
                                 scheme_name="sdirk3", newton_iters=2,
                                 block_b=16, interpret=False,
                                 refactor_every=1, n_ramp=None,
                                 ramp_block=1, newton_plateau=None):
    """Fused-kernel counterpart of solver.sdirk.integrate_observables.

    params : ScaledParams with (B, 1)-shaped fields
    y0     : (B, C, nx) scaled initial state
    dts    : (n_steps, B) step sizes
    dx     : (B,) cell sizes
    Returns (pl_t, trts_t, resid_t), each (n_steps + 1, B); resid_t is the
    per-knot Newton-convergence residual (see _solve_kernel).
    """
    B, C, nx = y0.shape
    n_steps = dts.shape[0]
    dtype = y0.dtype
    if jax.config.jax_enable_x64 and not interpret:
        # Trace the kernel with 32-bit canonicalization even when the
        # process runs x64 (the f64-emulated escalation rung requires
        # jax_enable_x64 globally): under x64, python-float literals
        # trace as weak f64 scalars and numpy ints as i64, producing
        # convert/pad operands Mosaic cannot lower (infinite recursion in
        # its convert_element_type rule / compile-helper abort). All
        # kernel inputs are explicitly 32-bit, so scoping x64 off around
        # the trace is semantics-preserving — verified bit-exact against
        # the unscoped non-x64 trace.
        with jax.enable_x64(False):
            return integrate_observables_pallas(
                params, y0, dts, dx, model=model, scheme_name=scheme_name,
                newton_iters=newton_iters, block_b=block_b,
                interpret=interpret, refactor_every=refactor_every,
                n_ramp=n_ramp, ramp_block=ramp_block,
                newton_plateau=newton_plateau)
    if B % block_b != 0:
        raise ValueError(f"batch {B} not divisible by block_b {block_b}")
    if (refactor_every <= 1 and ramp_block <= 1
            and newton_plateau in (None, newton_iters)):
        n_ramp = None
    if n_ramp is not None:
        if ramp_block > 1 and n_ramp % ramp_block != 0:
            raise ValueError(
                f"ramp_block ({ramp_block}) must divide n_ramp ({n_ramp})")
        if (n_steps - n_ramp) % refactor_every != 0:
            raise ValueError(
                f"refactor_every ({refactor_every}) must divide the "
                f"plateau length ({n_steps - n_ramp})")

    par = jnp.stack([jnp.reshape(f, (B,)) for f in params], axis=1)  # (B,NP)
    dx2 = jnp.pad(jnp.asarray(dx, dtype)[:, None], ((0, 0), (0, 3)))  # (B,4)
    y0_t = jnp.moveaxis(y0, 0, 1)          # (C, B, nx)
    dt_b = dts.T                           # (B, n_steps)

    kernel = functools.partial(
        _solve_kernel, model=model, scheme_name=scheme_name,
        newton_iters=newton_iters, n_steps=n_steps, n_ramp=n_ramp,
        refactor_every=refactor_every, ramp_block=ramp_block,
        newton_plateau=newton_plateau)

    grid = (B // block_b,)
    pl_t, tr_t, rs_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, n_steps), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, block_b, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, N_PARAM_FIELDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, n_steps + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n_steps + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, n_steps + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_steps + 1), dtype),
            jax.ShapeDtypeStruct((B, n_steps + 1), dtype),
            jax.ShapeDtypeStruct((B, n_steps + 1), dtype),
        ],
        interpret=interpret,
    )(dt_b, y0_t, par, dx2)
    return pl_t.T, tr_t.T, rs_t.T
