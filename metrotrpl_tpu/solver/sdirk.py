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
    block_tridiag_jacobian,
    p_block_tridiag_jacobian,
    pcr_apply,
    pcr_factor,
)

# State representation dispatch. The integrator supports two layouts with
# identical numerics (ops/blocktridiag.py layout note):
# * PLANES (tuple of C (..., n) arrays): the TPU layout — every op is a
#   fully tiled (sublane, lane) array; 2.67x less VPU work and VMEM than
#   stacked on TPU (both XLA:TPU and Mosaic pad C=3 -> 8 sublanes).
# * STACKED ((..., C, n) array): the CPU layout. The planes graph traces
#   to FEWER jaxpr eqns (5.8k vs 10.8k for one step) but its many small
#   independent buffers send XLA:CPU's backend into superlinear compile
#   times (measured 122 s vs 12 s for one nx=16 step); the stacked form
#   fuses into fewer, larger CPU loops.
_is_planes = lambda y: isinstance(y, (tuple, list))

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


def sdirk_factors(rhs, y, h, scheme, jac=None):
    """Factor the Newton matrix M = I - h*gamma*J(y) (PCR factors reusable
    across stages, Newton iterations, and — in chord mode — steps).

    y : tuple of C (..., n) planes (rhs maps plane tuple -> plane tuple) or
    a stacked (..., C, n) array (rhs maps array -> array).
    jac : optional symbolic block-tridiagonal Jacobian, plane layout only
        (y -> (L, D, U) nested tuples, physics.models.JAC_PLANES). Replaces
        the colored-JVP extraction (9 full RHS re-linearizations ~900
        plane-ops) with the ~100-op closed-form stencil; same math.
    """
    if not _is_planes(y):
        C = y.shape[-2]
        hb = jnp.asarray(h)[..., None, None]
        hg = (hb * scheme.gamma)[..., None]  # broadcasts over (C, C, n)
        L, D, U = block_tridiag_jacobian(rhs, y, C)
        MD = -hg * D
        # unit diagonal via an in-trace mask (.at[i, i].add would lower to
        # scatter-add, which Mosaic cannot lower inside Pallas kernels)
        ii = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
        eye = (ii == jj).astype(y.dtype)[..., None]
        MD = MD + eye
        alphas, betas, Dinv = pcr_factor(-hg * L, MD, -hg * U)
        return tuple(alphas), tuple(betas), Dinv
    C = len(y)
    hb = jnp.asarray(h)[..., None]       # broadcasts over (..., n) planes
    hg = hb * scheme.gamma
    L, D, U = jac(y) if jac is not None else p_block_tridiag_jacobian(rhs, y)
    # M = I - h*gamma*J, blockwise; the unit diagonal is plain Python
    # structure in plane representation (no iota masks needed)
    MD = tuple(tuple((1.0 - hg * D[i][j]) if i == j else -hg * D[i][j]
                     for j in range(C)) for i in range(C))
    ML = tuple(tuple(-hg * L[i][j] for j in range(C)) for i in range(C))
    MU = tuple(tuple(-hg * U[i][j] for j in range(C)) for i in range(C))
    alphas, betas, Dinv = pcr_factor(ML, MD, MU)
    return tuple(alphas), tuple(betas), Dinv


#: Streamed Newton-convergence diagnostic definition (read at TRACE time
#: by sdirk_stages; both the XLA scan and the Pallas kernel trace through
#: it): "last" = max |last Newton update| (the round-8 definition).
#: A contraction-extrapolated estimate q = |u_k| rho/(1-rho) ("qest") was
#: measured and REJECTED (scripts/probe_r11_predicate.py, round-10):
#: healthy far-off-truth states run the chord Newton NON-contracting
#: (q ~ 1e3+) while producing accurate observables, so convergence-rate
#: evidence cannot separate them from genuine collapses.
RESID_MODE = "last"

#: Damped (trust-region) Newton: each modified-Newton update is scaled so
#: its per-row max-norm never exceeds this cap (state is O(1)-rescaled;
#: healthy updates measured <= ~0.6 even far off-truth, while divergence
#: blows through O(1) on its way to inf/NaN — docs/TPU_NOTES.md
#: round-10). Damping preserves the update direction, cannot affect any
#: converging iteration (the cap never engages below it), and turns
#: would-be NaN explosions into finite steps that either re-converge on
#: later iterations/steps (L-stable scheme) or get flagged by the
#: residual/clamp predicates. None disables.
NEWTON_DAMP = 2.0


def _maxabs_update(d, planes):
    """Per-row max |d| of a Newton update: reduce each plane over its grid
    axis (planes layout, (..., n)) or the (C, n) trailing axes (stacked).
    The state is rescaled O(1) per simulation, so this is a relative-scale
    residual estimate: the size of the LAST Newton correction bounds the
    remaining stage error when the iteration contracts, and blows up O(1)+
    when it diverges (the partial-collapse failure surface,
    docs/TPU_NOTES.md round-7)."""
    if planes:
        parts = [jnp.max(jnp.abs(p), axis=-1) for p in d]
        out = parts[0]
        for p in parts[1:]:
            out = jnp.maximum(out, p)
        return out
    return jnp.max(jnp.abs(d), axis=(-2, -1))


def sdirk_stages(rhs, y, h, scheme, factors, newton_iters=2,
                 with_resid=False):
    """Run the stage sweep of one SDIRK step using prefactored Newton
    matrices (modified Newton: `factors` may be from an earlier state —
    the chord method — as long as h matches). y is a tuple of planes or a
    stacked (..., C, n) array; the stage algebra is representation-agnostic
    via jax.tree.map.

    with_resid=True also returns the per-row max |last Newton update|
    across the implicit stages — a convergence diagnostic (see
    :func:`_maxabs_update`)."""
    planes = _is_planes(y)
    # broadcast h over (..., n) planes / (..., C, n) stacked state
    hb = jnp.asarray(h)[..., None] if planes \
        else jnp.asarray(h)[..., None, None]
    gamma = scheme.gamma
    n_stages = scheme.A.shape[0]
    tmap = jax.tree.map
    fs = []
    resid = None
    for i in range(n_stages):
        acc = y
        for j in range(i):
            if scheme.A[i, j] != 0.0:
                # python-float coefficient: numpy scalars would promote a
                # float32 carry to float64 under jax_enable_x64
                c = float(scheme.A[i, j])
                acc = tmap(lambda a, f: a + (hb * c) * f, acc, fs[j])
        if scheme.A[i, i] == 0.0:
            # explicit first stage (ESDIRK): Y_i = y_n
            fs.append(rhs(y))
            continue
        # Solve Y = acc + h*gamma*f(Y) by modified Newton.
        Y = acc
        upd = []                 # per-iteration max |update| (diagnostic)
        for _ in range(newton_iters):
            G = tmap(lambda Yi, ri, ai: Yi - hb * gamma * ri - ai,
                     Y, rhs(Y), acc)
            d = pcr_apply(factors, G)
            if NEWTON_DAMP is not None:
                # trust-region damping (NEWTON_DAMP doc): scale the whole
                # row's update so max |d| <= cap; identity for any
                # converging iteration, NaN-proofs the diverging ones
                dmax = _maxabs_update(d, planes)
                s = jnp.minimum(1.0, NEWTON_DAMP
                                / jnp.maximum(dmax, NEWTON_DAMP))
                sb = s[..., None] if planes else s[..., None, None]
                d = tmap(lambda di: sb * di, d)
            Y = tmap(lambda Yi, di: Yi - di, Y, d)
            if with_resid:
                upd.append(_maxabs_update(d, planes))
        if with_resid:
            if RESID_MODE == "qest" and len(upd) >= 2:
                # rejected experiment hook (module docstring) — kept only
                # so the probe can re-measure; never the default
                rho = upd[-1] / jnp.maximum(upd[-2], 1e-30)
                q = upd[-1] * rho / jnp.maximum(1.0 - rho, 1e-6)
                r = jnp.where(upd[-1] < 1e-4, upd[-1], q)
            else:
                r = upd[-1]
            resid = r if resid is None else jnp.maximum(resid, r)
        fs.append(tmap(lambda Yi, ai: (Yi - ai) / (hb * gamma), Y, acc))
    if with_resid:
        return Y, resid
    return Y


def sdirk_step(rhs, y, h, scheme, newton_iters=2, jac=None,
               with_resid=False):
    """One SDIRK step of size h (h may be batched, broadcastable to the
    planes' batch dims).

    rhs : plane tuple (C arrays (..., n)) -> plane tuple
    Returns y_{n+1} (the final stage — all schemes here are stiffly
    accurate), plus the Newton-convergence residual when with_resid.
    """
    factors = sdirk_factors(rhs, y, h, scheme, jac=jac)
    return sdirk_stages(rhs, y, h, scheme, factors, newton_iters,
                        with_resid=with_resid)


def integrate_observables(rhs, observe, y0, dts, scheme_name="sdirk3",
                          newton_iters=2, refactor_every=1, n_ramp=None,
                          jac=None, ramp_block=1, newton_plateau=None,
                          with_resid=False):
    """Scan the stepper over a step-size sequence, emitting observables.

    y0 : plane-tuple state (C arrays of (..., n)).
    dts : (n_steps, ...) per-step sizes (leading axis = time).
    observe : plane-tuple state -> pytree of per-state observables.
    Returns a pytree of arrays with leading axis (n_steps + 1) including the
    initial state's observables at index 0.

    refactor_every > 1 enables chord (stale-Jacobian) stepping in the
    constant-step tail: blocks of `refactor_every` steps past n_ramp share
    one factorization. ramp_block > 1 does the same INSIDE the ramp
    ([0, n_ramp)): plan_time_grid's stepped ramp holds dt constant within
    each ramp_block-sized block, so one factorization (at the block's h)
    serves the whole block. Requires dt constant within every block and
    the phase lengths divisible by the block sizes (guaranteed by
    make_forward_plan). The Jacobian of the decaying solution varies
    slowly, so modified Newton keeps its contraction; validated against
    per-step refactorization in tests.

    newton_plateau : Newton iterations per stage for the constant-dt
    plateau ([n_ramp, n_steps)); None = same as `newton_iters`. The
    plateau solution varies slowly, so modified Newton contracts fast
    there and fewer corrections suffice — the ramp keeps the full count.
    Requires n_ramp (the phase boundary) when it differs.

    with_resid=True appends the per-step Newton-convergence residual
    (max |last update|, :func:`_maxabs_update`) to the emitted pytree:
    the return becomes ``(obs_tree, resid)`` with resid of shape
    (n_steps + 1, batch...) — index 0 (the initial state) is 0. The
    per-knot stream lets the caller mask padded-tail steps past a row's
    real measurement window before reducing.
    """
    scheme = SDIRK_SCHEMES[scheme_name]
    n_steps = dts.shape[0]
    ni_plateau = newton_iters if newton_plateau is None \
        else int(newton_plateau)

    def emit(y, resid):
        return (observe(y), resid) if with_resid else observe(y)

    def body(y, dt_k):
        out = sdirk_step(rhs, y, dt_k, scheme, newton_iters, jac=jac,
                         with_resid=with_resid)
        y_new, r = out if with_resid else (out, None)
        return y_new, emit(y_new, r)

    obs0 = observe(y0)
    if with_resid:
        r0 = jnp.zeros(jax.tree.leaves(obs0)[0].shape,
                       jax.tree.leaves(obs0)[0].dtype)
        obs0 = (obs0, r0)
    first = jax.tree.map(lambda x: x[None], obs0)

    if n_ramp is None or (refactor_every <= 1 and ramp_block <= 1
                          and ni_plateau == newton_iters):
        if ni_plateau != newton_iters:
            raise ValueError(
                "newton_plateau requires a chord-mode plan (n_ramp phase "
                "boundary); build the plan with newton_plateau set")
        _, obs = jax.lax.scan(body, y0, dts)
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), first, obs)

    def blocked_scan(y, seq, F, phase, ni):
        """Chord-scan `seq` in blocks of F steps sharing one factorization
        (dt constant within each block by the plan contract)."""
        if seq.shape[0] == 0:
            return y, None
        if F <= 1 and ni == newton_iters:
            return jax.lax.scan(body, y, seq)
        if seq.shape[0] % F != 0:
            raise ValueError(
                f"block size {F} must divide the {phase} length "
                f"({seq.shape[0]})")
        blocks = seq.reshape((seq.shape[0] // F, F) + seq.shape[1:])

        def block_body(y, dt_blk):
            # one factorization per block; h is constant within the block
            factors = sdirk_factors(rhs, y, dt_blk[0], scheme, jac=jac)
            outs = []
            for i in range(F):
                out = sdirk_stages(rhs, y, dt_blk[i], scheme, factors, ni,
                                   with_resid=with_resid)
                y, r = out if with_resid else (out, None)
                outs.append(emit(y, r))
            obs_blk = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *outs)
            return y, obs_blk

        y, obs = jax.lax.scan(block_body, y, blocks)
        return y, jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), obs)

    y_mid, obs1 = blocked_scan(y0, dts[:n_ramp], int(ramp_block), "ramp",
                               newton_iters)
    _, obs2 = blocked_scan(y_mid, dts[n_ramp:], int(refactor_every),
                           "plateau", ni_plateau)
    parts = [p for p in (first, obs1, obs2) if p is not None]
    return jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0), *parts)
