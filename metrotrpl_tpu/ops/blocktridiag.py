"""Block-tridiagonal Jacobians and solvers for 1D stencil PDEs.

These replace the role of LSODA's internal banded-Jacobian LU factorization
(used by the reference through scipy, reference forward_solver.py:162-178)
with TPU-friendly primitives.

LAYOUT — the load-bearing TPU design decision: the cell axis (nx, typically
128) is LAST so it maps onto the 128-wide vector lanes, and the tiny C x C
block structure lives in leading axes unrolled into elementwise arithmetic
on (batch, nx) planes. Block matrices are (..., C, C, n); block vectors are
(..., C, n). (The naive (..., n, C, C) layout puts the size-3 axis on lanes
and wastes ~40x of the VPU.)

* :func:`block_tridiag_jacobian` — extracts the (lower, diag, upper) block
  diagonals of df/dy for a nearest-neighbor cell stencil using 3*C colored
  JVPs. Correct by construction for any RHS whose cell i only couples to
  cells i-1, i, i+1.
* :func:`pcr_solve` — parallel cyclic reduction: ceil(log2 n) data-parallel
  elimination sweeps of unrolled block arithmetic (~7 sweeps for nx=128
  instead of 2*nx sequential Thomas steps).
* :func:`thomas_solve` — sequential block LU (lax.scan) reference/fallback.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def _mm(A, B):
    """Block matmul, blocks unrolled: (..., C, C, n) x (..., C, C, n)."""
    C = A.shape[-3]
    rows = []
    for i in range(C):
        cols = []
        for k in range(C):
            acc = A[..., i, 0, :] * B[..., 0, k, :]
            for j in range(1, C):
                acc = acc + A[..., i, j, :] * B[..., j, k, :]
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def _mv(A, x):
    """Block matvec: (..., C, C, n) x (..., C, n) -> (..., C, n)."""
    C = A.shape[-3]
    rows = []
    for i in range(C):
        acc = A[..., i, 0, :] * x[..., 0, :]
        for j in range(1, C):
            acc = acc + A[..., i, j, :] * x[..., j, :]
        rows.append(acc)
    return jnp.stack(rows, axis=-2)


def _shift(A, s):
    """Shift along the trailing cell axis: out[..., i] = A[..., i - s],
    zero-padded."""
    if s == 0:
        return A
    n = A.shape[-1]
    pad = [(0, 0)] * A.ndim
    if s > 0:
        pad[-1] = (s, 0)
        return jnp.pad(A, pad)[..., :n]
    pad[-1] = (0, -s)
    return jnp.pad(A, pad)[..., -s:]


def inv_small(A):
    """Inverse of small blocks (..., C, C, n), C in {1, 2, 3, 4}.

    Closed-form adjugate for C<=3; 2x2-block Schur inversion for C=4.
    Unpivoted — intended for the diagonally-dominant blocks of implicit
    time-steppers (I - h*gamma*J).
    """
    C = A.shape[-3]
    if C == 1:
        return 1.0 / A
    if C == 2:
        a, b = A[..., 0, 0, :], A[..., 0, 1, :]
        c, d = A[..., 1, 0, :], A[..., 1, 1, :]
        det = a * d - b * c
        return jnp.stack([
            jnp.stack([d, -b], axis=-2),
            jnp.stack([-c, a], axis=-2),
        ], axis=-3) / det[..., None, None, :]
    if C == 3:
        a = A
        c00 = a[..., 1, 1, :] * a[..., 2, 2, :] - a[..., 1, 2, :] * a[..., 2, 1, :]
        c01 = a[..., 1, 2, :] * a[..., 2, 0, :] - a[..., 1, 0, :] * a[..., 2, 2, :]
        c02 = a[..., 1, 0, :] * a[..., 2, 1, :] - a[..., 1, 1, :] * a[..., 2, 0, :]
        c10 = a[..., 0, 2, :] * a[..., 2, 1, :] - a[..., 0, 1, :] * a[..., 2, 2, :]
        c11 = a[..., 0, 0, :] * a[..., 2, 2, :] - a[..., 0, 2, :] * a[..., 2, 0, :]
        c12 = a[..., 0, 1, :] * a[..., 2, 0, :] - a[..., 0, 0, :] * a[..., 2, 1, :]
        c20 = a[..., 0, 1, :] * a[..., 1, 2, :] - a[..., 0, 2, :] * a[..., 1, 1, :]
        c21 = a[..., 0, 2, :] * a[..., 1, 0, :] - a[..., 0, 0, :] * a[..., 1, 2, :]
        c22 = a[..., 0, 0, :] * a[..., 1, 1, :] - a[..., 0, 1, :] * a[..., 1, 0, :]
        det = (a[..., 0, 0, :] * c00 + a[..., 0, 1, :] * c01
               + a[..., 0, 2, :] * c02)
        inv_det = 1.0 / det
        return jnp.stack([
            jnp.stack([c00, c10, c20], axis=-2),
            jnp.stack([c01, c11, c21], axis=-2),
            jnp.stack([c02, c12, c22], axis=-2),
        ], axis=-3) * inv_det[..., None, None, :]
    if C == 4:
        # Schur complement on the 2x2 block partition.
        P = A[..., :2, :2, :]
        Q = A[..., :2, 2:, :]
        R = A[..., 2:, :2, :]
        S = A[..., 2:, 2:, :]
        Pinv = inv_small(P)
        RPinv = _mm(R, Pinv)
        schur = S - _mm(RPinv, Q)
        Sinv = inv_small(schur)
        PinvQ = _mm(Pinv, Q)
        top_left = Pinv + _mm(_mm(PinvQ, Sinv), RPinv)
        top_right = -_mm(PinvQ, Sinv)
        bot_left = -_mm(Sinv, RPinv)
        top = jnp.concatenate([top_left, top_right], axis=-2)
        bot = jnp.concatenate([bot_left, Sinv], axis=-2)
        return jnp.concatenate([top, bot], axis=-3)
    raise NotImplementedError(f"inv_small: unsupported block size {C}")


# ---------------------------------------------------------------------------
# Plane (tuple) representation — the hot-path layout.
#
# Both XLA:TPU and Mosaic tile the LAST TWO dims of every array to (8, 128)
# for float32, so a stacked (B, C, n) value with C=3 pads 3 -> 8 sublanes:
# 2.67x wasted VPU work and VMEM on every op (measured 2.1x end-to-end on an
# elementwise mix, scripts/probe_r2_layout.py). The plane representation
# keeps each component as its own (..., n) array — a block vector is a tuple
# of C planes, a block matrix a C x C nested tuple — so every op runs on
# perfectly tiled (batch, n) planes and slicing/stacking relayouts vanish.
# The stacked (..., C, n) API below is retained for tests and fallbacks.
# ---------------------------------------------------------------------------


def p_mm(A, B):
    """Plane block matmul: C x C nested tuples of (..., n) planes."""
    C = len(A)
    out = []
    for i in range(C):
        row = []
        for k in range(C):
            acc = A[i][0] * B[0][k]
            for j in range(1, C):
                acc = acc + A[i][j] * B[j][k]
            row.append(acc)
        out.append(tuple(row))
    return tuple(out)


def p_mv(A, x):
    """Plane block matvec: nested-tuple matrix times tuple vector."""
    C = len(A)
    out = []
    for i in range(C):
        acc = A[i][0] * x[0]
        for j in range(1, C):
            acc = acc + A[i][j] * x[j]
        out.append(acc)
    return tuple(out)


def p_shift_m(A, s):
    return tuple(tuple(_shift(a, s) for a in row) for row in A)


def p_shift_v(x, s):
    return tuple(_shift(xi, s) for xi in x)


def p_neg(A):
    return tuple(tuple(-a for a in row) for row in A)


def p_inv_small(A):
    """Plane inverse of small blocks, C in {1, 2, 3, 4} (see inv_small)."""
    C = len(A)
    if C == 1:
        return ((1.0 / A[0][0],),)
    if C == 2:
        a, b = A[0]
        c, d = A[1]
        idet = 1.0 / (a * d - b * c)
        return ((d * idet, -b * idet), (-c * idet, a * idet))
    if C == 3:
        c00 = A[1][1] * A[2][2] - A[1][2] * A[2][1]
        c01 = A[1][2] * A[2][0] - A[1][0] * A[2][2]
        c02 = A[1][0] * A[2][1] - A[1][1] * A[2][0]
        c10 = A[0][2] * A[2][1] - A[0][1] * A[2][2]
        c11 = A[0][0] * A[2][2] - A[0][2] * A[2][0]
        c12 = A[0][1] * A[2][0] - A[0][0] * A[2][1]
        c20 = A[0][1] * A[1][2] - A[0][2] * A[1][1]
        c21 = A[0][2] * A[1][0] - A[0][0] * A[1][2]
        c22 = A[0][0] * A[1][1] - A[0][1] * A[1][0]
        idet = 1.0 / (A[0][0] * c00 + A[0][1] * c01 + A[0][2] * c02)
        return ((c00 * idet, c10 * idet, c20 * idet),
                (c01 * idet, c11 * idet, c21 * idet),
                (c02 * idet, c12 * idet, c22 * idet))
    if C == 4:
        # Schur complement on the 2x2 block partition.
        sub = lambda r0, c0: tuple(tuple(A[r0 + i][c0 + j]
                                         for j in range(2)) for i in range(2))
        P, Q, R, S = sub(0, 0), sub(0, 2), sub(2, 0), sub(2, 2)
        Pinv = p_inv_small(P)
        RPinv = p_mm(R, Pinv)
        schur = tuple(tuple(S[i][j] - x for j, x in enumerate(row))
                      for i, row in enumerate(p_mm(RPinv, Q)))
        Sinv = p_inv_small(schur)
        PinvQ = p_mm(Pinv, Q)
        corr = p_mm(p_mm(PinvQ, Sinv), RPinv)
        top_left = tuple(tuple(Pinv[i][j] + corr[i][j] for j in range(2))
                         for i in range(2))
        top_right = p_neg(p_mm(PinvQ, Sinv))
        bot_left = p_neg(p_mm(Sinv, RPinv))
        return tuple(
            [top_left[i] + top_right[i] for i in range(2)]
            + [bot_left[i] + Sinv[i] for i in range(2)])
    raise NotImplementedError(f"p_inv_small: unsupported block size {C}")


def p_block_tridiag_jacobian(f, y):
    """Plane-representation counterpart of :func:`block_tridiag_jacobian`.

    f : tuple of C planes (..., n) -> tuple of C planes.
    Returns (L, D, U) as C x C nested tuples of (..., n) planes.
    """
    C = len(y)
    n = y[0].shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
    color_mask = [(idx % 3 == c).astype(y[0].dtype) for c in range(3)]

    Lc = [[None] * C for _ in range(C)]
    Dc = [[None] * C for _ in range(C)]
    Uc = [[None] * C for _ in range(C)]
    zero_plane = jnp.zeros(y[0].shape, dtype=y[0].dtype)
    for c in range(3):
        dsel = (c - idx) % 3
        is_d = dsel == 0
        is_u = dsel == 1
        is_l = dsel == 2
        for b in range(C):
            seed = tuple(
                jnp.broadcast_to(color_mask[c], y[bb].shape) if bb == b
                else jnp.zeros_like(y[bb]) for bb in range(C))
            u = jax.jvp(f, (y,), (seed,))[1]
            for a in range(C):
                Dc[a][b] = jnp.where(is_d, u[a],
                                     Dc[a][b] if Dc[a][b] is not None
                                     else zero_plane)
                Uc[a][b] = jnp.where(is_u, u[a],
                                     Uc[a][b] if Uc[a][b] is not None
                                     else zero_plane)
                Lc[a][b] = jnp.where(is_l, u[a],
                                     Lc[a][b] if Lc[a][b] is not None
                                     else zero_plane)
    as_t = lambda M: tuple(tuple(row) for row in M)
    return as_t(Lc), as_t(Dc), as_t(Uc)


def block_tridiag_jacobian(f, y, ncomp):
    """Extract (L, D, U) block diagonals of J = df/dy via colored JVPs.

    f : state (..., C, n) -> (..., C, n), cell i coupled only to i-1, i, i+1.
    Returns L, D, U with shape (..., C, C, n): row-block at cell i is
    [L[..., :, :, i] (col i-1), D (col i), U (col i+1)]; L at cell 0 and U
    at cell n-1 are zero.

    Uses 3*C forward-mode seeds: color c selects source cells j = c (mod 3);
    the three stencil neighbors of any cell have distinct residues mod 3, so
    each JVP output entry is exactly one Jacobian block column.
    """
    n = y.shape[-1]
    C = y.shape[-2]
    if C != ncomp:
        raise ValueError("ncomp mismatch")

    # masks computed in-trace (2D iota — TPU/Pallas requires >= 2D, and
    # in-trace construction avoids captured constants inside Pallas kernels)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
    color_mask = [(idx % 3 == c).astype(y.dtype) for c in range(3)]

    # Seeds built from static masks and assembled with static indices —
    # no scatters, no inner vmap (both can trip the TPU Mosaic pipeline
    # inside long scans, and static assembly compiles leaner anyway).
    Lcols = [[None] * C for _ in range(C)]
    Dcols = [[None] * C for _ in range(C)]
    Ucols = [[None] * C for _ in range(C)]
    zero_plane = jnp.zeros(y.shape[:-2] + (n,), dtype=y.dtype)
    for c in range(3):
        dsel = (c - idx) % 3
        is_d = dsel == 0
        is_u = dsel == 1
        is_l = dsel == 2
        for b in range(C):
            comps = [color_mask[c] if bb == b else jnp.zeros_like(color_mask[c])
                     for bb in range(C)]
            seed = jnp.broadcast_to(jnp.stack(comps, axis=0), y.shape)
            u = jax.jvp(f, (y,), (seed,))[1]  # (..., C, n)
            for a in range(C):
                ua = u[..., a, :]
                Dcols[a][b] = jnp.where(is_d, ua,
                                        Dcols[a][b] if Dcols[a][b] is not None
                                        else zero_plane)
                Ucols[a][b] = jnp.where(is_u, ua,
                                        Ucols[a][b] if Ucols[a][b] is not None
                                        else zero_plane)
                Lcols[a][b] = jnp.where(is_l, ua,
                                        Lcols[a][b] if Lcols[a][b] is not None
                                        else zero_plane)

    def assemble(cols):
        return jnp.stack([jnp.stack(row, axis=-2) for row in cols], axis=-3)

    return assemble(Lcols), assemble(Dcols), assemble(Ucols)


def block_tridiag_matvec(L, D, U, x):
    """(L, D, U) block-tridiag times x; blocks (..., C, C, n), x (..., C, n)."""
    y = _mv(D, x)
    y = y + _mv(L, _shift(x, 1))
    y = y + _mv(U, _shift(x, -1))
    return y


_is_planes = lambda y: isinstance(y, (tuple, list))


def pcr_factor(L, D, U):
    """Run the PCR matrix path once, recording per-level (alpha, beta)
    update operators plus the final decoupled D^-1. The returned factors
    can be applied to any number of right-hand sides via :func:`pcr_apply`.

    Blocks are either nested tuples of (..., n) planes or stacked
    (..., C, C, n) arrays (representation dispatch: solver/sdirk.py layout
    note)."""
    if not _is_planes(L):
        n = L.shape[-1]
        n_levels = int(math.ceil(math.log2(n))) if n > 1 else 0
        alphas, betas = [], []
        s = 1
        for _ in range(n_levels):
            Dinv = inv_small(D)
            alpha = -_mm(L, _shift(Dinv, s))
            beta = -_mm(U, _shift(Dinv, -s))
            alphas.append(alpha)
            betas.append(beta)
            L, D, U = (
                _mm(alpha, _shift(L, s)),
                D + _mm(alpha, _shift(U, s)) + _mm(beta, _shift(L, -s)),
                _mm(beta, _shift(U, -s)),
            )
            s *= 2
        return alphas, betas, inv_small(D)
    n = L[0][0].shape[-1]
    n_levels = int(math.ceil(math.log2(n))) if n > 1 else 0
    alphas, betas = [], []
    s = 1
    add = lambda A, B: tuple(tuple(a + b for a, b in zip(ra, rb))
                             for ra, rb in zip(A, B))
    for _ in range(n_levels):
        Dinv = p_inv_small(D)
        alpha = p_neg(p_mm(L, p_shift_m(Dinv, s)))
        beta = p_neg(p_mm(U, p_shift_m(Dinv, -s)))
        alphas.append(alpha)
        betas.append(beta)
        L, D, U = (
            p_mm(alpha, p_shift_m(L, s)),
            add(D, add(p_mm(alpha, p_shift_m(U, s)),
                       p_mm(beta, p_shift_m(L, -s)))),
            p_mm(beta, p_shift_m(U, -s)),
        )
        s *= 2
    return alphas, betas, p_inv_small(D)


def pcr_apply(factors, b):
    """Solve M x = b using factors from :func:`pcr_factor`; b is a tuple of
    C (..., n) planes or a stacked (..., C, n) array."""
    alphas, betas, Dinv_final = factors
    if not _is_planes(b):
        s = 1
        for alpha, beta in zip(alphas, betas):
            b = b + _mv(alpha, _shift(b, s)) + _mv(beta, _shift(b, -s))
            s *= 2
        return _mv(Dinv_final, b)
    s = 1
    for alpha, beta in zip(alphas, betas):
        lo = p_mv(alpha, p_shift_v(b, s))
        hi = p_mv(beta, p_shift_v(b, -s))
        b = tuple(bi + li + hj for bi, li, hj in zip(b, lo, hi))
        s *= 2
    return p_mv(Dinv_final, b)


def pcr_solve(L, D, U, b):
    """Solve the block-tridiagonal system via parallel cyclic reduction.

    L/D/U (..., C, C, n), b (..., C, n). Requires the cell-0 block of L and
    the cell-(n-1) block of U to be zero. After ceil(log2 n) reduction
    sweeps every equation is decoupled and x = D^-1 b.

    One-shot convenience over the production :func:`pcr_factor` /
    :func:`pcr_apply` pair (same sweep, so the pcr tests exercise the
    integrator's actual path)."""
    return pcr_apply(pcr_factor(L, D, U), b)


def thomas_solve(L, D, U, b):
    """Sequential block LU solve (lax.scan over cells). Reference/fallback."""
    def fwd(carry, blocks):
        C_prev, d_prev = carry
        Li, Di, Ui, bi = blocks
        denom = inv_small(Di - _mm(Li, C_prev))
        C_i = _mm(denom, Ui)
        d_i = _mv(denom, bi - _mv(Li, d_prev))
        return (C_i, d_i), (C_i, d_i)

    # move the cell axis to the scan front, keep blocks as (..., C, C, 1)
    Ls = jnp.moveaxis(L, -1, 0)[..., None]
    Ds = jnp.moveaxis(D, -1, 0)[..., None]
    Us = jnp.moveaxis(U, -1, 0)[..., None]
    bs = jnp.moveaxis(b, -1, 0)[..., None]
    C0 = jnp.zeros_like(Ls[0])
    d0 = jnp.zeros_like(bs[0])
    _, (Cs, ds) = jax.lax.scan(fwd, (C0, d0), (Ls, Ds, Us, bs))

    def bwd(x_next, blocks):
        C_i, d_i = blocks
        x_i = d_i - _mv(C_i, x_next)
        return x_i, x_i

    xN = jnp.zeros_like(ds[0])
    _, xs = jax.lax.scan(bwd, xN, (Cs, ds), reverse=True)
    return jnp.moveaxis(xs[..., 0], 0, -1)
