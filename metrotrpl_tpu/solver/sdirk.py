"""L-stable (E)SDIRK steppers with shared block-tridiagonal factorization.

Every implicit stage has the same diagonal coefficient gamma, so the Newton
matrix M = I - h*gamma*J is factored once per step (parallel cyclic
reduction) and reused by all stages and all modified-Newton iterations.
Stage derivatives are recovered from the stage identity
f_i = (Y_i - y_n - h*sum_j a_ij f_j) / (h*gamma), avoiding extra RHS calls.

Schemes:
* ``trbdf2`` — ESDIRK23 form of TR-BDF2 (2nd order, L-stable), the classic
  choice for drift-diffusion.
* ``sdirk3`` — Alexander's 3-stage SDIRK (3rd order, L-stable), the default:
  its h^3 local error lets the staub workload run near the reference's hmax
  with log10-observable errors well below likelihood significance.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from metrotrpl_tpu.ops.blocktridiag import (
    _mm,
    _mv,
    _shift,
    block_tridiag_jacobian,
    inv_small,
)

_SQRT2 = math.sqrt(2.0)
_G3 = 0.435866521508458999416019  # root of x^3 - 3x^2 + 3x/2 - 1/6


class SDIRKScheme(NamedTuple):
    name: str
    A: np.ndarray      # Butcher matrix, lower triangular, A[i,i] in {0, gamma}
    gamma: float       # diagonal coefficient of the implicit stages
    order: int


SDIRK_SCHEMES = {
    "trbdf2": SDIRKScheme(
        name="trbdf2",
        A=np.array([
            [0.0, 0.0, 0.0],
            [1 - 1 / _SQRT2, 1 - 1 / _SQRT2, 0.0],
            [_SQRT2 / 4, _SQRT2 / 4, 1 - 1 / _SQRT2],
        ]),
        gamma=1 - 1 / _SQRT2,
        order=2,
    ),
    "sdirk3": SDIRKScheme(
        name="sdirk3",
        A=np.array([
            [_G3, 0.0, 0.0],
            [(1 - _G3) / 2, _G3, 0.0],
            [-1.5 * _G3 ** 2 + 4 * _G3 - 0.25,
             1.5 * _G3 ** 2 - 5 * _G3 + 1.25, _G3],
        ]),
        gamma=_G3,
        order=3,
    ),
    # Backward Euler (1st order) — robustness fallback / testing
    "be": SDIRKScheme(name="be", A=np.array([[1.0]]), gamma=1.0, order=1),
}


def pcr_factor(L, D, U):
    """Run the PCR matrix path once, recording per-level (alpha, beta)
    update operators plus the final decoupled D^-1. The returned factors
    can be applied to any number of right-hand sides via :func:`pcr_apply`."""
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


def pcr_apply(factors, b):
    """Solve M x = b using factors from :func:`pcr_factor`."""
    alphas, betas, Dinv_final = factors
    s = 1
    for alpha, beta in zip(alphas, betas):
        b = b + _mv(alpha, _shift(b, s)) + _mv(beta, _shift(b, -s))
        s *= 2
    return _mv(Dinv_final, b)


def sdirk_step(rhs, y, h, scheme, newton_iters=2):
    """One SDIRK step of size h (h may be batched, broadcastable to
    y.shape[:-2]).

    rhs : state (..., C, n) -> (..., C, n)
    Returns y_{n+1} (the final stage — all schemes here are stiffly
    accurate).
    """
    C = y.shape[-2]
    hb = jnp.asarray(h)[..., None, None]  # broadcast over (C, n)
    gamma = scheme.gamma

    # Newton matrix M = I - h*gamma*J(y_n), factored once per step.
    L, D, U = block_tridiag_jacobian(rhs, y, C)
    hg = (hb * gamma)[..., None]  # broadcasts over (C, C, n)
    MD = -hg * D
    for i in range(C):  # unit diagonal: M = I - h*gamma*J
        MD = MD.at[..., i, i, :].add(1.0)
    factors = pcr_factor(-hg * L, MD, -hg * U)

    n_stages = scheme.A.shape[0]
    fs = []
    for i in range(n_stages):
        acc = y
        for j in range(i):
            if scheme.A[i, j] != 0.0:
                # python-float coefficient: numpy scalars would promote a
                # float32 carry to float64 under jax_enable_x64
                acc = acc + (hb * float(scheme.A[i, j])) * fs[j]
        if scheme.A[i, i] == 0.0:
            # explicit first stage (ESDIRK): Y_i = y_n
            fs.append(rhs(y))
            continue
        # Solve Y = acc + h*gamma*f(Y) by modified Newton.
        Y = acc
        for _ in range(newton_iters):
            G = Y - hb * gamma * rhs(Y) - acc
            Y = Y - pcr_apply(factors, G)
        fs.append((Y - acc) / (hb * gamma))
    return Y


def integrate_observables(rhs, observe, y0, dts, scheme_name="sdirk3",
                          newton_iters=2):
    """Scan the stepper over a step-size sequence, emitting observables.

    dts : (n_steps, ...) per-step sizes (leading axis = time).
    observe : state -> pytree of per-state observables.
    Returns a pytree of arrays with leading axis (n_steps + 1) including the
    initial state's observables at index 0.
    """
    scheme = SDIRK_SCHEMES[scheme_name]

    def body(y, dt_k):
        y_new = sdirk_step(rhs, y, dt_k, scheme, newton_iters)
        return y_new, observe(y_new)

    _, obs = jax.lax.scan(body, y0, dts)
    first = jax.tree.map(lambda x: x[None], observe(y0))
    return jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), first, obs)
