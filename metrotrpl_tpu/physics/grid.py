"""Static space/time grid planning (host-side numpy, trace-time constants).

The reference uses an adaptive LSODA integrator capped at hmax
(reference sim_utils.py:246-277, forward_solver.py:163-165). The TPU stepper
instead walks a fixed step grid built here: each output interval is split to
respect hmax, with a geometric ramp of small steps at early times where the
initial Beer-Lambert transient is fast. Everything is computed at trace time,
so all shapes are static and the stepper compiles to a single ``lax.scan``.
"""

from typing import NamedTuple

import numpy as np


class SpaceGrid(NamedTuple):
    thickness: float
    nx: int
    dx: float
    x_centers: np.ndarray  # (nx,) cell-center coordinates


def make_space_grid(thickness, nx):
    dx = thickness / nx
    x = np.linspace(dx / 2, thickness - dx / 2, nx)
    return SpaceGrid(float(thickness), int(nx), float(dx), x)


class TimeGrid(NamedTuple):
    """Solver step plan.

    dt : (n_steps,) step sizes [ns]; t_k = sum(dt[:k])
    out_idx : (nt,) index into the step-state sequence for each output time
        (0 = initial state). In interpolated mode this is the LEFT knot of
        the bracketing pair.
    t_solver : (n_steps + 1,) the solver knot times (diagnostics).
    out_w : (nt,) interpolation weight of the RIGHT knot (0 when outputs
        are knot-aligned).
    """
    dt: np.ndarray
    out_idx: np.ndarray
    t_solver: np.ndarray
    out_w: np.ndarray


def plan_time_grid(t_out, hmax=4.0, h0=1e-3, growth=1.25, refine=1,
                   align_outputs=True, tail_growth=1.0, tail_block=1,
                   ramp_block=1):
    """Build a solver step grid.

    hmax must be a positive finite step bound; callers translate the
    reference's hmax=0 "no step limit" sentinel before reaching here
    (inference/likelihood.py resolve_solver_mode).

    align_outputs=True lands a knot exactly on every output time (solver
    step count then scales with the OUTPUT density — the reference's
    dense-output behavior). align_outputs=False decouples them: the step
    grid is just the geometric ramp + hmax-capped coverage of [0, t_final],
    and each output time maps to a bracketing knot pair + weight for
    interpolation. With hmax above the output spacing this cuts the step
    count by hmax/spacing; the consumer interpolates observables (in log
    space, exact for exponential decays — solver/forward.py).

    Parameters
    ----------
    t_out : increasing output times starting at 0.
    hmax : maximum step [ns] (reference's solver hmax).
    h0, growth : initial step and geometric growth factor of the early-time
        ramp; the ramp caps the step envelope until it reaches hmax.
    refine : extra uniform subdivision factor of every interval
        (accuracy/convergence knob).
    tail_growth : > 1 lets the step KEEP growing geometrically past hmax
        (decoupled mode only): the decay timescale lengthens with t, so the
        plateau's constant hmax over-resolves the tail. Growth is applied
        once per ``tail_block`` steps (h constant within a block — the
        chord-compatible stepped-geometric schedule).
    ramp_block : > 1 makes the early-time ramp STEPPED: h is held constant
        for ``ramp_block`` steps, then multiplied by growth**ramp_block.
        The per-step envelope h(k) = h0 * growth**(ramp_block*floor(k/
        ramp_block)) never exceeds the smooth ramp's h0*growth**k, so the
        scheme accuracy is preserved while the Newton matrix only needs
        refactoring once per block (chord stepping inside the ramp — the
        ramp is ~65%% of per-solve FLOPs at the production settings,
        docs/TPU_NOTES.md round-5).
    """
    t_out = np.asarray(t_out, dtype=np.float64)
    if t_out[0] != 0:
        raise ValueError("Grid error - times must start at t=0")
    if len(t_out) < 2:
        raise ValueError("Need at least two output times")
    if np.any(np.diff(t_out) <= 0):
        raise ValueError("Output times must be strictly increasing")
    if not (np.isfinite(hmax) and hmax > 0):
        raise ValueError(
            f"plan_time_grid needs a positive finite hmax (got {hmax}); "
            "the hmax=0 'no step limit' sentinel must be resolved by the "
            "caller")

    t_final = float(t_out[-1])
    # True geometric early-time knots: 0, h0, h0(1+g), ... until the step
    # reaches hmax. The first solver step really is h0 — essential for the
    # sharp Beer-Lambert transient (large first steps make the float32
    # Newton diverge even though the scheme is L-stable).
    ramp = [0.0]
    h = h0
    lvl_growth = growth ** int(ramp_block)
    while h < hmax and ramp[-1] + h < t_final:
        for _ in range(int(ramp_block)):
            if ramp[-1] + h >= t_final:
                break
            ramp.append(ramp[-1] + h)
        h = h * lvl_growth
    ramp = np.array(ramp[1:])

    if tail_growth > 1.0 and not align_outputs:
        # Stepped-geometric tail: continue the ramp past hmax, multiplying
        # h by tail_growth once per tail_block steps. Subdivide by `refine`
        # as in the envelope path below.
        knots = [0.0]
        h = h0
        while h < hmax and knots[-1] + h < t_final:
            for _ in range(int(ramp_block)):
                if knots[-1] + h >= t_final:
                    break
                for s in range(1, int(refine) + 1):
                    knots.append(knots[-1] + h / refine)
            h = h * lvl_growth
        h = float(hmax)
        n_in_block = 0
        while t_final - knots[-1] > 1e-9 * t_final:
            step = min(h, t_final - knots[-1])
            for s in range(1, int(refine) + 1):
                knots.append(knots[-1] + step / refine)
            n_in_block += 1
            if n_in_block % int(tail_block) == 0:
                h = h * tail_growth
        knots[-1] = t_final  # absorb float accumulation drift
        t_solver = np.array(knots)
    else:
        if align_outputs:
            base = np.unique(np.concatenate([t_out, ramp]))
        else:
            base = np.unique(np.concatenate([[0.0, t_final], ramp]))

        # Subdivide any gap > hmax (and apply the uniform `refine` factor).
        knots = [base[0]]
        for a, b in zip(base[:-1], base[1:]):
            n_sub = max(int(np.ceil((b - a) / hmax)), 1) * int(refine)
            step = (b - a) / n_sub
            for s in range(1, n_sub + 1):
                knots.append(a + step * s)
        t_solver = np.array(knots)

    if align_outputs:
        # map each output time to its knot index (exact membership by
        # construction, up to float roundoff)
        out_idx = np.searchsorted(t_solver, t_out)
        out_idx = np.clip(out_idx, 0, len(t_solver) - 1)
        # guard against roundoff landing one knot early
        for j, t in enumerate(t_out):
            k = out_idx[j]
            if abs(t_solver[k] - t) > 1e-9 * max(1.0, abs(t)):
                if k > 0 and abs(t_solver[k - 1] - t) <= 1e-9 * max(1.0, abs(t)):
                    out_idx[j] = k - 1
                else:
                    raise AssertionError("output time missing from solver grid")
        out_w = np.zeros(len(t_out))
    else:
        # left knot of the bracketing pair + right-knot weight
        out_idx = np.clip(np.searchsorted(t_solver, t_out, side="right") - 1,
                          0, len(t_solver) - 2)
        span = t_solver[out_idx + 1] - t_solver[out_idx]
        out_w = np.clip((t_out - t_solver[out_idx]) / span, 0.0, 1.0)

    dt = np.diff(t_solver)
    return TimeGrid(dt=dt, out_idx=out_idx, t_solver=t_solver, out_w=out_w)


def pad_time_grid(tg, n_steps, nt):
    """Pad a TimeGrid to static sizes shared across a measurement batch.

    Padded steps repeat the final dt (extra compute, no effect on outputs);
    padded output slots point at step 0 and must be masked by the caller.
    """
    pad_steps = n_steps - len(tg.dt)
    pad_out = nt - len(tg.out_idx)
    if pad_steps < 0 or pad_out < 0:
        raise ValueError("Padding target smaller than grid")
    dt = np.concatenate([tg.dt, np.full(pad_steps, tg.dt[-1])])
    out_idx = np.concatenate([tg.out_idx, np.zeros(pad_out, dtype=np.int64)])
    out_w = np.concatenate([tg.out_w, np.zeros(pad_out)])
    t_solver = np.concatenate(
        [tg.t_solver, tg.t_solver[-1] + np.cumsum(np.full(pad_steps, tg.dt[-1]))]
    )
    return TimeGrid(dt=dt, out_idx=out_idx, t_solver=t_solver, out_w=out_w)
