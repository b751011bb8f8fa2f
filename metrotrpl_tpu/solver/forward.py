"""Batched forward-simulation driver (the reference ``solve()`` equivalent,
reference forward_solver.py:41-225, re-architected for TPU).

A single call advances a whole batch of simulations — (chains x measurements)
or a dense-sampler parameter grid — through one compiled ``lax.scan``. All
shapes are static; per-measurement heterogeneity (thickness, time grids,
measurement type) is carried as batched data, not Python control flow.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from metrotrpl_tpu.physics.grid import make_space_grid, pad_time_grid, plan_time_grid
from metrotrpl_tpu.physics.models import (
    JAC_PLANES,
    RHS,
    RHS_PLANES,
    initial_state,
    make_scaled_params,
    observable_multipliers,
    observables_planes,
    observables_std,
    unstack_state,
)
from metrotrpl_tpu.solver.sdirk import SDIRK_SCHEMES, integrate_observables

PARAM_NAMES_STD = ("n0", "p0", "mu_n", "mu_p", "ks", "Cn", "Cp", "Sf", "Sb",
                   "tauN", "tauP", "eps", "Tm")
PARAM_NAMES_TRAPS = PARAM_NAMES_STD + ("kC", "Nt", "tauE")

# Measured global relative accuracy of the log10 observables at refine=1,
# hmax<=4 on the staub workload (BASELINE.md "Accuracy vs LSODA"): ~2e-6.
# sdirk3 is 3rd order, so `refine` scales this by refine^-3.
BASE_GLOBAL_RERR = 2e-6


def refine_for_tols(rtol, atol=None, n_steps=500, logger=None):
    """Map the config's LSODA-style rtol/atol onto the fixed-step scheme's
    ``refine`` factor (VERDICT r1 missing #5: these knobs must be honored
    or loudly rejected — the reference consumes them at
    forward_solver.py:162-178).

    Model: rtol is LSODA's PER-STEP relative tolerance; local errors
    accumulate like a random walk, so the equivalent GLOBAL target is
    rtol * sqrt(n_steps). refine is chosen so the measured global error
    BASE_GLOBAL_RERR / refine^3 meets that target, clamped to [1, 4].

    atol has no independent meaning here: the solver state is rescaled to
    O(1) per simulation (physics/models.py docstring), so absolute and
    relative tolerances coincide up to the density scale. A warning is
    logged when atol would have been the binding constraint for LSODA.
    """
    if rtol is None:
        return 1
    target = float(rtol) * np.sqrt(max(int(n_steps), 1))
    refine = max(1, int(np.ceil(np.cbrt(BASE_GLOBAL_RERR / target))))
    if refine > 4:
        if logger is not None:
            logger.warning(
                f"Solver rtol={rtol} requests refine={refine}; clamping to "
                "4 (finest validated fixed-step grid). Expected global "
                f"accuracy ~{BASE_GLOBAL_RERR / 64:.1e}.")
        refine = 4
    if logger is not None:
        logger.info(
            f"Solver rtol={rtol} -> fixed-step refine={refine} (measured "
            f"global err {BASE_GLOBAL_RERR:.0e} at refine=1, 3rd-order "
            "scheme). atol is subsumed by the O(1) state rescaling.")
        if atol is not None and float(atol) > float(rtol):
            logger.warning(
                f"Solver atol={atol} > rtol={rtol}: the fixed-step scheme "
                "treats tolerances relatively; atol is ignored.")
    return refine


class ForwardPlan(NamedTuple):
    """Static per-measurement solve plan (host-side numpy).

    All measurements share nx and the padded (n_steps, nt) sizes so they
    batch into one scan.
    """
    nx: int
    n_steps: int
    nt: int
    model: str
    scheme: str
    newton_iters: int
    dx: np.ndarray          # (M,)
    x_centers: np.ndarray   # (M, nx) cell centers [nm]
    dt: np.ndarray          # (M, n_steps) step sizes [ns]
    out_idx: np.ndarray     # (M, nt) knot index per output time (left knot
                            # of the bracketing pair in interpolated mode)
    out_mask: np.ndarray    # (M, nt) True where the output slot is real
    is_trpl: np.ndarray     # (M,) True for TRPL, False for TRTS
    nt_actual: np.ndarray   # (M,) true number of output points
    out_w: np.ndarray = None  # (M, nt) right-knot lerp weight (None/0 when
                              # outputs are knot-aligned)
    n_ramp: int = None      # first step index from which every row's dt is
                            # constant (chord-mode phase boundary)
    refactor_every: int = 1  # Newton-matrix refactor period past n_ramp
    ramp_block: int = 1     # Newton-matrix refactor period INSIDE the ramp
                            # (dt is constant within each ramp block by
                            # plan_time_grid construction; 1 = every step)
    newton_plateau: int = None  # Newton iterations per stage past n_ramp
                                # (None = newton_iters; the slowly-varying
                                # plateau usually converges in fewer)
    solve_dtype: str = None     # execute this plan's solves in a specific
                                # dtype regardless of the caller's walk
                                # dtype (e.g. "float64" for the emulated
                                # high-precision escalation rung — requires
                                # jax_enable_x64; results are cast back).
                                # None = caller's dtype.


def make_forward_plan(lengths, nxes, meas_types, times_list, hmax=4.0,
                      model="std", scheme="sdirk3", newton_iters=2,
                      h0=1e-3, growth=1.25, refine=1, align_outputs=True,
                      refactor_every=1, tail_growth=1.0, tail_block=1,
                      ramp_block=1, newton_plateau=None):
    """Build a ForwardPlan for a measurement set.

    times_list : list of per-measurement output-time arrays (must start at 0).
    All nx must currently be equal (pad-to-max masking of the spatial grid is
    not yet implemented; the reference staub workloads use a common nx,
    reference MCMC_script_writer.py:48).

    align_outputs=False decouples the solver step grid from the output
    times (observables log-interpolated between knots — see
    physics/grid.py:plan_time_grid); the step count then scales with
    t_final/hmax instead of the output density.
    """
    nxes = list(nxes)
    if len(set(int(n) for n in nxes)) != 1:
        raise NotImplementedError(
            "Batched solver currently requires a common nx across measurements"
        )
    nx = int(nxes[0])
    grids = [plan_time_grid(t, hmax=hmax, h0=h0, growth=growth, refine=refine,
                            align_outputs=align_outputs,
                            tail_growth=tail_growth, tail_block=tail_block,
                            ramp_block=ramp_block)
             for t in times_list]
    n_steps = max(len(g.dt) for g in grids)
    nt = max(len(g.out_idx) for g in grids)

    if newton_plateau is not None and int(newton_plateau) == int(newton_iters):
        newton_plateau = None  # explicit same-count = no phase split needed
    n_ramp = None
    if refactor_every > 1 or ramp_block > 1 or newton_plateau is not None:
        # chord-mode phase boundary: the first step index from which every
        # row's dt is constant (padding repeats the last dt, preserving it)
        dtm = np.stack([np.concatenate(
            [g.dt, np.full(n_steps - len(g.dt), g.dt[-1])]) for g in grids])
        changed = np.abs(np.diff(dtm, axis=1)) > 1e-12 * dtm[:, 1:]
        any_changed = np.any(changed, axis=0)
        n_ramp = (int(np.max(np.nonzero(any_changed)[0])) + 2
                  if any_changed.any() else 0)
        if n_ramp >= n_steps:
            # no constant-dt tail; chord mode degenerates to per-step
            # refactorization. This is what a stepped-geometric tail
            # (tail_growth > 1) produces: dt changes once per tail_block
            # block to the very end, so there is no plateau for the chord
            # to reuse a factorization over — warn, since the caller asked
            # for both and silently gets neither chord's speedup.
            import logging
            logging.getLogger("MCMC").warning(
                "refactor_every=%d requested but the step grid has no "
                "constant-dt plateau%s; refactorizing every step.",
                int(refactor_every),
                (" (stepped-geometric tail_growth=%g keeps dt changing "
                 "blockwise to t_final)" % tail_growth
                 if tail_growth and tail_growth > 1.0 else ""))
            n_ramp = None
            ramp_block = 1
            newton_plateau = None
        else:
            if ramp_block > 1:
                # phase-1 chord blocks need dt constant within every
                # ramp_block-sized block: every dt change must land on a
                # block boundary (plan_time_grid's stepped ramp guarantees
                # this unless an output-aligned grid or a t_final-truncated
                # ramp split a block), and n_ramp on a block multiple.
                R = int(ramp_block)
                starts = np.nonzero(any_changed)[0] + 1  # new-dt start idx
                n_ramp_b = n_ramp + (-n_ramp) % R
                if np.all(starts % R == 0) and n_ramp_b <= n_steps:
                    n_ramp = n_ramp_b
                else:
                    import logging
                    logging.getLogger("MCMC").warning(
                        "ramp_block=%d requested but the step grid's dt "
                        "changes do not align to block boundaries "
                        "(output-aligned grid or truncated ramp); "
                        "refactorizing every ramp step.", R)
                    ramp_block = 1
            # round the plateau length up to a multiple of the refactor
            # period (extra steps repeat the final dt; outputs unaffected)
            n_steps += (-(n_steps - n_ramp)) % int(refactor_every)

    padded = [pad_time_grid(g, n_steps, nt) for g in grids]

    space = [make_space_grid(th, nx) for th in lengths]
    nt_actual = np.array([len(t) for t in times_list])
    out_mask = np.arange(nt)[None, :] < nt_actual[:, None]

    return ForwardPlan(
        nx=nx,
        n_steps=n_steps,
        nt=nt,
        model=model,
        scheme=scheme,
        newton_iters=newton_iters,
        dx=np.array([g.dx for g in space]),
        x_centers=np.stack([g.x_centers for g in space]),
        dt=np.stack([g.dt for g in padded]),
        out_idx=np.stack([g.out_idx for g in padded]),
        out_mask=out_mask,
        is_trpl=np.array([m == "TRPL" for m in meas_types]),
        nt_actual=nt_actual,
        out_w=(None if align_outputs
               else np.stack([g.out_w for g in padded])),
        n_ramp=n_ramp,
        refactor_every=int(refactor_every),
        ramp_block=int(ramp_block),
        newton_plateau=(None if newton_plateau is None
                        else int(newton_plateau)),
    )


def _interp_knots(obs, out_idx, w):
    """Interpolate per-knot observables onto output times.

    obs (B, n_steps+1), out_idx (B, nt) left knot, w (B, nt) right weight.
    Geometric (log-space) interpolation where both endpoints are positive —
    exact for exponential decay segments, which is what PL/TRTS tails are —
    with a linear fallback around sign changes/zeros.
    """
    lo = jnp.take_along_axis(obs, out_idx, axis=1)
    hi = jnp.take_along_axis(obs, out_idx + 1, axis=1)
    lin = lo + w * (hi - lo)
    both_pos = (lo > 0) & (hi > 0)
    safe_lo = jnp.where(both_pos, lo, 1.0)
    safe_hi = jnp.where(both_pos, hi, 1.0)
    geo = safe_lo * jnp.exp(w * jnp.log(safe_hi / safe_lo))
    return jnp.where(both_pos, geo, lin)


def solve_forward_batch(init_dN, raw_params, dx, dt, out_idx, is_trpl,
                        model="std", scheme="sdirk3", newton_iters=2,
                        min_y=None, backend="xla", block_b=None, out_w=None,
                        refactor_every=1, n_ramp=None, layout="auto",
                        batch_mult=1, ramp_block=1, newton_plateau=None,
                        with_diag=False):
    """Run a batch of forward simulations and return linear observables in
    measurement units (TRPL [cm^-2 s^-1] / TRTS, selected per row).

    Shapes (B = batch):
    init_dN   (B, nx) excess-density profile [nm^-3]
    raw_params dict name -> (B,) model-unit parameters
    dx        (B,)
    dt        (B, n_steps)
    out_idx   (B, nt) int
    is_trpl   (B,) bool
    out_w     (B, nt) optional right-knot weights: observables are
        interpolated between knots out_idx and out_idx+1 — geometrically
        (log-space, exact for exponential decay) where both are positive,
        linearly otherwise.
    refactor_every : re-factor the Newton matrix only on steps where dt
        changes or every this many steps (chord/stale-Jacobian iteration);
        1 = every step.

    Returns sol (B, nt) with the reference's tail clamp applied: after the
    first time the signal dips below min_y everything is held at min_y
    (reference forward_solver.py:190-201).

    backend="auto" = the fused Pallas kernel on TPU (fastest at every
    measured batch size since the plane-tuple/antisymmetric-split rework),
    the XLA op-graph elsewhere (docs/TPU_NOTES.md perf table).

    block_b : Pallas batch-block rows. None (default) = pick by measured
    optimum: 48 once the effective batch exceeds one 48-block, else 16
    (the threshold is on the PRE-padding size so e.g. B=90 pads to 96 and
    runs the fast 96/b48 schedule, never the anomalously slow 96/b16 one
    — docs/TPU_NOTES.md). An explicit value is always respected.
    batch_mult : effective-batch multiplier for the block_b choice when
    this call is traced per-slice under vmap (e.g. vmap_ensembles traces
    the per-ensemble batch; the device runs E of them fused).
    with_diag : also return the per-row Newton-convergence residual
    (max |last Newton update| over every step whose knot any output
    sample can read — padded-tail steps past a row's real window are
    masked out). The solver state is rescaled O(1), so healthy solves sit
    orders of magnitude below 1 while a diverging (partial-collapse)
    Newton blows past it — the dynamic failure predicate the underflow
    clamp alone cannot provide (docs/TPU_NOTES.md round-7).
    """
    if backend == "auto":
        # The fused kernel only lowers on TPU; CPU always takes the
        # op-graph. Since the plane-tuple + antisymmetric-split rework the
        # fused kernel is the fastest TPU path at EVERY batch size
        # (sweep_r2_final: B=48 3314 vs 2942 solves/s, B=96 5400 vs 483,
        # B=192 7346 vs 949), so auto = pallas whenever we are on TPU.
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        backend = "pallas" if on_tpu else "xla"
    if block_b is None:
        block_b = 48 if init_dN.shape[0] * batch_mult > 48 else 16
    # Pad the batch to a multiple of the float32 sublane count. This keeps
    # every (B, nx) plane tile-aligned AND works around an observed TPU
    # (axon/Mosaic) miscompile where sublane-padded batches (e.g. B=6)
    # produce corrupted rows; padded rows replicate row 0 and are dropped
    # before returning.
    B_in = init_dN.shape[0]
    pad = (-B_in) % (block_b if backend.startswith("pallas") else 8)
    if pad:
        def _pad8(a):
            a = jnp.asarray(a)
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)
        init_dN = _pad8(init_dN)
        raw_params = {k: _pad8(v) for k, v in raw_params.items()}
        dx = _pad8(dx)
        dt = _pad8(dt)
        out_idx = _pad8(out_idx)
        is_trpl = _pad8(is_trpl)
        if out_w is not None:
            out_w = _pad8(out_w)

    dtype = init_dN.dtype
    # Per-simulation density scale: keeps the state O(1) in float32.
    ns = jnp.max(init_dN, axis=-1) + raw_params["p0"] + raw_params["n0"]

    p = make_scaled_params(raw_params, dx, ns)
    p = jax.tree.map(lambda a: jnp.asarray(a, dtype)[..., None], p)
    dxb = jnp.asarray(dx, dtype)[..., None]

    y0 = initial_state(init_dN, ns[..., None], model=model, dtype=dtype)
    dts = jnp.asarray(dt, dtype).T  # (n_steps, B)

    resid_t = None
    if backend in ("pallas", "pallas_interpret"):
        from metrotrpl_tpu.solver.pallas_step import integrate_observables_pallas
        pl_t, trts_t, resid_t = integrate_observables_pallas(
            p, y0, dts, jnp.asarray(dx, dtype), model=model,
            scheme_name=scheme, newton_iters=newton_iters, block_b=block_b,
            interpret=(backend == "pallas_interpret"),
            refactor_every=refactor_every, n_ramp=n_ramp,
            ramp_block=ramp_block, newton_plateau=newton_plateau)
    else:
        # State representation (solver/sdirk.py dispatch note): PLANES on
        # TPU (fully tiled (B, nx) ops — 2.67x less VPU/VMEM than stacked),
        # STACKED on CPU/GPU (the planes graph's op count sends XLA:CPU's
        # LLVM codegen into superlinear compile times). layout= overrides
        # for parity tests.
        if layout == "auto":
            layout = ("planes"
                      if jax.default_backend() not in ("cpu", "gpu")
                      else "stacked")
        if layout == "planes":
            rhs_fn = RHS_PLANES[model]
            rhs = lambda y: rhs_fn(y, p)
            jac_fn = JAC_PLANES.get(model)
            jac = (lambda y: jac_fn(y, p)) if jac_fn is not None else None
            observe = lambda y: observables_planes(
                y, p, dxb[..., 0], model=model)
            y0i = unstack_state(y0, model)
        else:
            rhs_fn = RHS[model]
            rhs = lambda y: rhs_fn(y, p)
            jac = None
            observe = lambda y: observables_std(
                y, p, dxb[..., 0], model=model)
            y0i = y0
        out = integrate_observables(
            rhs, observe, y0i, dts, scheme_name=scheme,
            newton_iters=newton_iters, refactor_every=refactor_every,
            n_ramp=n_ramp, jac=jac, ramp_block=ramp_block,
            newton_plateau=newton_plateau, with_resid=with_diag)
        if with_diag:
            (pl_t, trts_t), resid_t = out
        else:
            pl_t, trts_t = out

    if out_w is None:
        # (n_steps+1, B) -> (B, nt) gather at output knots
        pl_out = jnp.take_along_axis(pl_t.T, out_idx, axis=1)
        trts_out = jnp.take_along_axis(trts_t.T, out_idx, axis=1)
    else:
        w = jnp.asarray(out_w, dtype)
        pl_out = _interp_knots(pl_t.T, out_idx, w)
        trts_out = _interp_knots(trts_t.T, out_idx, w)

    pl_mult, trts_mult = observable_multipliers(raw_params, ns)
    sol = jnp.where(
        is_trpl[:, None],
        pl_out * pl_mult[:, None],
        trts_out * trts_mult[:, None],
    )

    if min_y is None:
        min_y = float(np.finfo(np.dtype(dtype)).tiny)
    below = sol < min_y
    first = jnp.argmax(below, axis=1)
    do_clamp = jnp.take_along_axis(below, first[:, None], axis=1)
    tail = jnp.arange(sol.shape[1])[None, :] >= first[:, None]
    sol = jnp.where(tail & do_clamp, min_y, sol)
    if not with_diag:
        return sol[:B_in]
    if resid_t is None:  # backend that doesn't stream it (none currently)
        resid = jnp.zeros((sol.shape[0],), dtype)
    else:
        # reduce the per-knot residual stream over the knots any output
        # sample of this row can read; padded-tail steps past the row's
        # real window integrate post-decay garbage by design and must
        # not flag the row. NaNs propagate through jnp.maximum, so a
        # non-finite state inside the window keeps resid non-finite.
        kmax = jnp.max(out_idx, axis=1) + (0 if out_w is None else 1)
        knots = jnp.arange(resid_t.shape[0])[None, :]       # (1, n_steps+1)
        r = jnp.where(knots <= kmax[:, None], resid_t.T, 0.0)
        resid = jnp.max(r, axis=1)
    return sol[:B_in], resid[:B_in]


def solve_single(init_dN, raw_params, thickness, nx, t_out, meas="TRPL",
                 model="std", hmax=4.0, scheme="sdirk3", newton_iters=2,
                 dtype=jnp.float64, refine=1, h0=1e-3, growth=1.25,
                 align_outputs=True, refactor_every=1, backend="xla",
                 tail_growth=1.0, tail_block=1, ramp_block=1,
                 newton_plateau=None):
    """Convenience single-simulation solve (tests, GUI quicksim).

    Mirrors the oracle's :func:`solve_reference` interface.
    """
    plan = make_forward_plan(
        [thickness], [nx], [meas], [np.asarray(t_out)], hmax=hmax,
        model=model, scheme=scheme, newton_iters=newton_iters, refine=refine,
        h0=h0, growth=growth, align_outputs=align_outputs,
        refactor_every=refactor_every,
        tail_growth=tail_growth, tail_block=tail_block,
        ramp_block=ramp_block, newton_plateau=newton_plateau)
    params_b = {k: jnp.asarray([v], dtype) for k, v in raw_params.items()}
    sol = solve_forward_batch(
        jnp.asarray(init_dN, dtype)[None],
        params_b,
        jnp.asarray(plan.dx, dtype),
        jnp.asarray(plan.dt, dtype),
        jnp.asarray(plan.out_idx),
        jnp.asarray(plan.is_trpl),
        model=model, scheme=scheme, newton_iters=newton_iters,
        backend=backend,
        out_w=(None if plan.out_w is None else jnp.asarray(plan.out_w, dtype)),
        refactor_every=plan.refactor_every, n_ramp=plan.n_ramp,
        ramp_block=plan.ramp_block, newton_plateau=plan.newton_plateau)
    return np.asarray(sol[0])
