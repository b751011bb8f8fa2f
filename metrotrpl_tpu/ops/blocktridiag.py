"""Block-tridiagonal Jacobians and solvers for 1D stencil PDEs.

These replace the role of LSODA's internal banded-Jacobian LU factorization
(used by the reference through scipy, reference forward_solver.py:162-178)
with TPU-friendly primitives:

* :func:`block_tridiag_jacobian` — extracts the (lower, diag, upper) 3x3 (or
  CxC) block diagonals of df/dy for a nearest-neighbor cell stencil using
  3*C colored JVPs. Correct by construction for any RHS whose cell i only
  couples to cells i-1, i, i+1.
* :func:`pcr_solve` — parallel cyclic reduction: ceil(log2 n) data-parallel
  elimination sweeps, each a batch of small-block einsums. This is the
  TPU-native choice: ~7 vectorized steps for nx=128 instead of 2*nx
  sequential Thomas steps.
* :func:`thomas_solve` — sequential block LU (lax.scan) kept as a reference
  and fallback.
"""

import math

import jax
import jax.numpy as jnp


def inv_small(A):
    """Inverse of small (..., C, C) blocks, C in {1, 2, 3, 4}.

    Closed-form adjugate for C<=3; one step of 2x2-block Schur inversion
    for C=4. Unpivoted — intended for the diagonally-dominant blocks of
    implicit time-steppers (I - h*gamma*J).
    """
    C = A.shape[-1]
    if C == 1:
        return 1.0 / A
    if C == 2:
        a, b = A[..., 0, 0], A[..., 0, 1]
        c, d = A[..., 1, 0], A[..., 1, 1]
        det = a * d - b * c
        inv = jnp.stack([
            jnp.stack([d, -b], axis=-1),
            jnp.stack([-c, a], axis=-1),
        ], axis=-2)
        return inv / det[..., None, None]
    if C == 3:
        a = A
        c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
        c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
        c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
        c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
        c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
        c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
        c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
        c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
        c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
        det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
        adj = jnp.stack([
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ], axis=-2)
        return adj / det[..., None, None]
    if C == 4:
        # Schur complement on the 2x2 block partition.
        P = A[..., :2, :2]
        Q = A[..., :2, 2:]
        R = A[..., 2:, :2]
        S = A[..., 2:, 2:]
        Pinv = inv_small(P)
        RPinv = _mm(R, Pinv)
        schur = S - _mm(RPinv, Q)
        Sinv = inv_small(schur)
        PinvQ = _mm(Pinv, Q)
        top_left = Pinv + _mm(_mm(PinvQ, Sinv), RPinv)
        top_right = -_mm(PinvQ, Sinv)
        bot_left = -_mm(Sinv, RPinv)
        top = jnp.concatenate([top_left, top_right], axis=-1)
        bot = jnp.concatenate([bot_left, Sinv], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
    raise NotImplementedError(f"inv_small: unsupported block size {C}")


def _mm(A, B):
    return jnp.einsum("...ij,...jk->...ik", A, B)


def _mv(A, x):
    return jnp.einsum("...ij,...j->...i", A, x)


def _shift(A, s, axis):
    """shift_down by s along cell axis: out[i] = A[i-s], zero-padded."""
    if s == 0:
        return A
    pad = [(0, 0)] * A.ndim
    if s > 0:
        pad[axis] = (s, 0)
        sl = [slice(None)] * A.ndim
        sl[axis] = slice(0, A.shape[axis])
        return jnp.pad(A, pad)[tuple(sl)]
    pad[axis] = (0, -s)
    sl = [slice(None)] * A.ndim
    sl[axis] = slice(-s, A.shape[axis] - s)
    return jnp.pad(A, pad)[tuple(sl)]


def block_tridiag_jacobian(f, y, ncomp):
    """Extract (L, D, U) block diagonals of J = df/dy via colored JVPs.

    f : state (..., n, C) -> (..., n, C), cell i coupled only to i-1, i, i+1.
    Returns L, D, U with shape (..., n, C, C): row-block i of J is
    [L_i (col i-1), D_i (col i), U_i (col i+1)]; L_0 and U_{n-1} are zero.

    Uses 3*C forward-mode seeds: color c selects source cells j = c (mod 3);
    the three stencil neighbors of any cell have distinct residues mod 3, so
    each JVP output entry is exactly one Jacobian block column.
    """
    n = y.shape[-2]
    C = y.shape[-1]
    if C != ncomp:
        raise ValueError("ncomp mismatch")

    idx = jnp.arange(n)

    def one_seed(cb):
        c, b = cb // C, cb % C
        seed = jnp.zeros_like(y)
        seed = seed.at[..., :, b].set(
            jnp.where(idx % 3 == c, 1.0, 0.0).astype(y.dtype))
        return jax.jvp(f, (y,), (seed,))[1]

    # (3*C, ..., n, C) stack of JVP outputs
    us = jax.vmap(one_seed)(jnp.arange(3 * C))

    L = jnp.zeros(y.shape[:-1] + (C, C), dtype=y.dtype)
    D = jnp.zeros_like(L)
    U = jnp.zeros_like(L)
    for c in range(3):
        # dsel per cell: 0 -> this color is the cell itself (diag),
        # 1 -> the right neighbor (upper), 2 -> the left neighbor (lower)
        dsel = (c - idx) % 3
        is_d = (dsel == 0)[:, None]
        is_u = (dsel == 1)[:, None]
        is_l = (dsel == 2)[:, None]
        for b in range(C):
            u = us[c * C + b]  # (..., n, C) = J[:, (cells = c mod 3, comp b)]
            D = D.at[..., :, :, b].set(jnp.where(is_d, u, D[..., :, :, b]))
            U = U.at[..., :, :, b].set(jnp.where(is_u, u, U[..., :, :, b]))
            L = L.at[..., :, :, b].set(jnp.where(is_l, u, L[..., :, :, b]))
    return L, D, U


def block_tridiag_matvec(L, D, U, x):
    """(L, D, U) block-tridiag times x, cell axis -3 of blocks / -2 of x."""
    y = _mv(D, x)
    y = y + _mv(L, _shift(x, 1, axis=-2))
    y = y + _mv(U, _shift(x, -1, axis=-2))
    return y


def pcr_solve(L, D, U, b, n_steps=None):
    """Solve the block-tridiagonal system via parallel cyclic reduction.

    All arrays batched: L/D/U (..., n, C, C), b (..., n, C). Requires
    L[..., 0, :, :] == 0 and U[..., n-1, :, :] == 0. After ceil(log2 n)
    reduction sweeps every equation is decoupled and x = D^-1 b.
    """
    n = b.shape[-2]
    if n_steps is None:
        n_steps = int(math.ceil(math.log2(n))) if n > 1 else 0

    s = 1
    for _ in range(n_steps):
        Dinv = inv_small(D)
        Dinv_m = _shift(Dinv, s, axis=-3)
        Dinv_p = _shift(Dinv, -s, axis=-3)
        alpha = -_mm(L, Dinv_m)
        beta = -_mm(U, Dinv_p)
        L_new = _mm(alpha, _shift(L, s, axis=-3))
        U_new = _mm(beta, _shift(U, -s, axis=-3))
        D_new = (D + _mm(alpha, _shift(U, s, axis=-3))
                 + _mm(beta, _shift(L, -s, axis=-3)))
        b_new = (b + _mv(alpha, _shift(b, s, axis=-2))
                 + _mv(beta, _shift(b, -s, axis=-2)))
        L, D, U, b = L_new, D_new, U_new, b_new
        s *= 2
    return _mv(inv_small(D), b)


def thomas_solve(L, D, U, b):
    """Sequential block LU solve (lax.scan over cells). Reference/fallback."""
    def fwd(carry, blocks):
        C_prev, d_prev = carry
        Li, Di, Ui, bi = blocks
        denom = inv_small(Di - _mm(Li, C_prev))
        C_i = _mm(denom, Ui)
        d_i = _mv(denom, bi - _mv(Li, d_prev))
        return (C_i, d_i), (C_i, d_i)

    # move cell axis to front for scan
    Ls = jnp.moveaxis(L, -3, 0)
    Ds = jnp.moveaxis(D, -3, 0)
    Us = jnp.moveaxis(U, -3, 0)
    bs = jnp.moveaxis(b, -2, 0)
    C0 = jnp.zeros_like(Ls[0])
    d0 = jnp.zeros_like(bs[0])
    _, (Cs, ds) = jax.lax.scan(fwd, (C0, d0), (Ls, Ds, Us, bs))

    def bwd(x_next, blocks):
        C_i, d_i = blocks
        x_i = d_i - _mv(C_i, x_next)
        return x_i, x_i

    xN = jnp.zeros_like(ds[0])
    _, xs = jax.lax.scan(bwd, xN, (Cs, ds), reverse=True)
    return jnp.moveaxis(xs, 0, -2)
