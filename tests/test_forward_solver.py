"""Forward solver accuracy tests: SDIRK/PCR stepper vs the float64 LSODA
oracle, plus analytic-limit physics contracts (reference
test_forward_solver.py strategy: diffusion flattening, LI SRH / radiative
decay constants)."""

import numpy as np
import pytest

from metrotrpl_tpu.oracle import solve_reference
from metrotrpl_tpu.oracle.scipy_reference import beer_lambert as bl_np
from metrotrpl_tpu.solver.forward import solve_single

UC = {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5, "mu_p": 1e5, "ks": 1e12,
      "Cn": 1e33, "Cp": 1e33, "Sf": 1e-2, "Sb": 1e-2}


def staub_params(**over):
    base = {"n0": 1e8, "p0": 3e15, "mu_n": 20, "mu_p": 20, "ks": 4.8e-11,
            "Cn": 4.4e-29, "Cp": 4.4e-29, "Sf": 10, "Sb": 10,
            "tauN": 511, "tauP": 871, "eps": 10, "Tm": 300}
    base.update(over)
    return {k: v * UC.get(k, 1) for k, v in base.items()}


def _ic(thickness, nx, fluence_cm=2.12e11, alpha_cm=6e4):
    dx = thickness / nx
    x = np.linspace(dx / 2, thickness - dx / 2, nx)
    return bl_np(fluence_cm * 1e-14, alpha_cm * 1e-7, x)


@pytest.mark.parametrize("scheme,tol", [("sdirk3", 3e-5), ("trbdf2", 1e-4)])
def test_matches_lsoda_staub_thin(scheme, tol):
    """log10 PL agreement with the reference-math LSODA solve on the staub
    311nm curve — far below likelihood significance (~1e-3)."""
    thickness, nx = 311.0, 64
    params = staub_params()
    init_dN = _ic(thickness, nx)
    t_out = np.linspace(0, 2000, 201)
    ref = solve_reference(init_dN, thickness, nx, t_out, params)
    mine = solve_single(init_dN, params, thickness, nx, t_out, scheme=scheme)
    err = np.abs(np.log10(mine) - np.log10(ref))
    assert err.max() < tol, f"max log10 err {err.max():.2e}"


def test_matches_lsoda_thick_high_fluence():
    """2000nm sample at 100x fluence — stronger drift/field coupling."""
    thickness, nx = 2000.0, 64
    params = staub_params()
    init_dN = _ic(thickness, nx, fluence_cm=2.12e13)
    t_out = np.linspace(0, 1000, 101)
    ref = solve_reference(init_dN, thickness, nx, t_out, params)
    mine = solve_single(init_dN, params, thickness, nx, t_out)
    err = np.abs(np.log10(mine) - np.log10(ref))
    assert err.max() < 2e-4, f"max log10 err {err.max():.2e}"


def test_f32_high_fluence_stability():
    """float32 solve of the staub 2.75e13 cm^-2 fluence row (the highest
    power in Inputs/staub_MAPI_threepower_twothick_fluences.csv).

    Regression guard for the antisymmetric split (physics/models.py
    docstring): with the state stored as (dN, dP, E), the f32 sum flux
    Jn+Jp is pure rounding noise at this fluence and the drift feedback
    blows the solve up at t~220 ns on every backend; storing dD = dP - dN
    makes the sum flux exact algebra. Asserts the f32 fast-mode solve
    stays finite and within likelihood significance of the f64 oracle.
    """
    import jax.numpy as jnp

    thickness, nx = 311.0, 64
    params = staub_params()
    init_dN = _ic(thickness, nx, fluence_cm=2.75e13)
    t_out = np.linspace(0, 2000, 501)
    ref = solve_reference(init_dN, thickness, nx, t_out, params)
    mine = solve_single(init_dN, params, thickness, nx, t_out,
                        hmax=16.0, align_outputs=False, dtype=jnp.float32)
    assert np.isfinite(mine).all()
    err = np.abs(np.log10(np.maximum(mine, 1e-30)) - np.log10(ref))
    # 2.4e-3 measured (truncation-dominated tail); 0.05 = data significance
    assert err.max() < 2e-2, f"max log10 err {err.max():.2e}"


def test_matches_lsoda_trts():
    thickness, nx = 311.0, 48
    params = staub_params()
    init_dN = _ic(thickness, nx)
    t_out = np.linspace(0, 500, 101)
    ref = solve_reference(init_dN, thickness, nx, t_out, params, meas="TRTS")
    mine = solve_single(init_dN, params, thickness, nx, t_out, meas="TRTS")
    err = np.abs(np.log10(mine) - np.log10(ref))
    assert err.max() < 5e-5


def test_matches_lsoda_traps_model():
    thickness, nx = 311.0, 48
    params = staub_params()
    params.update({"kC": 1e-11 * 1e12 / 1e-21 * 1e-21,  # nm^3/ns scale
                   "Nt": 1e15 * 1e-21, "tauE": 300.0})
    params["kC"] = 5.0  # [nm^3 / ns] — modest capture rate
    init_dN = _ic(thickness, nx)
    t_out = np.linspace(0, 500, 101)
    ref = solve_reference(init_dN, thickness, nx, t_out, params, model="traps")
    mine = solve_single(init_dN, params, thickness, nx, t_out, model="traps")
    err = np.abs(np.log10(mine) - np.log10(ref))
    assert err.max() < 1e-4


def test_li_srh_decay_constant():
    """Low injection, SRH only: PL ~ exp(-2 t / tauN)? No — excess decays
    as exp(-t/tauN), PL ∝ p0*dN so PL decays with tau = tauN
    (reference test_forward_solver.py LI SRH contract)."""
    thickness, nx = 311.0, 32
    tauN = 450.0
    params = staub_params(mu_n=0.01, mu_p=0.01, ks=0, Cn=0, Cp=0, Sf=0, Sb=0,
                          tauN=tauN, tauP=tauN)
    params["ks"] = 1e-20  # tiny but nonzero so PL is measurable
    init_dN = np.full(nx, 1e11 * 1e-21)  # uniform, dN << p0
    t_out = np.linspace(0, 1000, 101)
    mine = solve_single(init_dN, params, thickness, nx, t_out)
    # fit decay constant on log PL
    slope = np.polyfit(t_out, np.log(mine), 1)[0]
    tau_fit = -1.0 / slope
    assert abs(tau_fit - tauN) / tauN < 2e-3


def test_li_radiative_decay_constant():
    """Low injection, radiative only: tau = 1 / (ks * p0)."""
    thickness, nx = 311.0, 32
    params = staub_params(mu_n=0.01, mu_p=0.01, Cn=0, Cp=0, Sf=0, Sb=0,
                          tauN=1e9, tauP=1e9)
    ks, p0 = params["ks"], params["p0"]
    tau_expect = 1.0 / (ks * p0)
    init_dN = np.full(nx, 1e11 * 1e-21)
    t_out = np.linspace(0, tau_expect, 51)
    mine = solve_single(init_dN, params, thickness, nx, t_out)
    slope = np.polyfit(t_out, np.log(mine), 1)[0]
    tau_fit = -1.0 / slope
    assert abs(tau_fit - tau_expect) / tau_expect < 2e-3


def test_diffusion_flattens_profile():
    """Diffusion only: total PL conserved while the profile flattens
    (integrated radiative rate approaches the flat-profile limit)."""
    thickness, nx = 311.0, 32
    # ks tiny: radiative acts as a passive probe, not a carrier sink
    params = staub_params(ks=1e-20, Cn=0, Cp=0, Sf=0, Sb=0,
                          tauN=1e9, tauP=1e9, n0=1e-10, p0=1e-10)
    # sharp initial profile, strong diffusion (flattens in < 1 ns)
    init_dN = _ic(thickness, nx, alpha_cm=3e5)
    t_out = np.linspace(0, 50, 41)
    mine = solve_single(init_dN, params, thickness, nx, t_out)
    mean_dn = init_dN.mean()
    # with negligible n0/p0 and recombination, PL -> ks * dN_flat^2 * L
    pl_flat = params["ks"] * mean_dn ** 2 * thickness * 1e23
    assert mine[0] > 1.5 * pl_flat  # sharp profile has higher integral
    np.testing.assert_allclose(mine[-1], pl_flat, rtol=1e-2)


def test_depletion_clamps_tail():
    """A sim that decays to (numerical) zero gets its tail clamped at min_y
    instead of going negative/NaN (reference forward_solver.py:190-193)."""
    thickness, nx = 311.0, 32
    params = staub_params(Sf=1e6, Sb=1e6, tauN=1, tauP=1)
    init_dN = _ic(thickness, nx, fluence_cm=1e9)
    t_out = np.linspace(0, 2000, 101)
    mine = solve_single(init_dN, params, thickness, nx, t_out)
    assert np.all(mine > 0)
    assert np.all(np.isfinite(mine))


def test_pallas_backend_matches_xla_interpret():
    """The fused Pallas kernel (interpret mode on CPU) equals the XLA path
    bit-for-bit on a small batch."""
    import jax
    import jax.numpy as jnp

    from metrotrpl_tpu.physics.models import beer_lambert
    from metrotrpl_tpu.solver.forward import make_forward_plan, solve_forward_batch

    # smallest meaningful shapes: the planes-representation graph the
    # interpret path traces compiles superlinearly slowly on XLA:CPU
    # (solver/sdirk.py representation note), so keep nx (PCR depth) and
    # the step count minimal
    B, nx = 8, 32
    lengths = [311.0, 2000.0] * 4
    times = [np.linspace(0, 50, 9)] * B
    # mixed observables: the kernel's TRTS branch duplicates
    # physics.models.observables_planes (pallas_step.py observed()), so
    # pin BOTH branches against the XLA path to catch divergence
    meas_types = ["TRPL", "TRTS"] * 4
    plan = make_forward_plan(lengths, [nx] * B, meas_types, times)
    x = jnp.asarray(plan.x_centers, jnp.float32)
    init = beer_lambert(jnp.full((B, 1), 2.12e-3, jnp.float32),
                        jnp.full((B, 1), 6e-3, jnp.float32), x)
    params = staub_params()
    raw = {k: jnp.full(B, v, jnp.float32) for k, v in params.items()}
    args = (init, raw, jnp.asarray(plan.dx, jnp.float32),
            jnp.asarray(plan.dt, jnp.float32), jnp.asarray(plan.out_idx),
            jnp.asarray(plan.is_trpl))
    sx = np.asarray(jax.jit(
        lambda *a: solve_forward_batch(*a, backend="xla"))(*args))
    sp = np.asarray(jax.jit(
        lambda *a: solve_forward_batch(
            *a, backend="pallas_interpret", block_b=8))(*args))
    # xla on CPU runs the stacked layout, the kernel runs planes; the two
    # are the same math with reassociated f32 reductions
    np.testing.assert_allclose(sp, sx, rtol=2e-5)

    # backend="auto" must resolve to the op-graph on CPU (the fused kernel
    # only lowers on TPU) and reproduce the XLA result exactly
    sa = np.asarray(jax.jit(
        lambda *a: solve_forward_batch(*a, backend="auto"))(*args))
    np.testing.assert_array_equal(sa, sx)


def test_interp_outputs_match_aligned():
    """Decoupled solver knots + log-space output interpolation
    (align_outputs=False) agree with the knot-aligned solve far below
    likelihood significance, at ~3x fewer steps when hmax exceeds the
    output spacing."""
    from metrotrpl_tpu.solver.forward import make_forward_plan

    thickness, nx = 311.0, 64
    params = staub_params()
    init_dN = _ic(thickness, nx)
    t_out = np.linspace(0, 2000, 201)
    ref = solve_single(init_dN, params, thickness, nx, t_out)  # aligned h4

    p16 = make_forward_plan([thickness], [nx], ["TRPL"], [t_out],
                            hmax=16.0, align_outputs=False)
    p4 = make_forward_plan([thickness], [nx], ["TRPL"], [t_out], hmax=4.0)
    assert p16.n_steps < p4.n_steps / 2
    assert p16.out_w is not None
    assert np.all((p16.out_w >= 0) & (p16.out_w <= 1))

    mine = solve_single(init_dN, params, thickness, nx, t_out,
                        hmax=16.0, align_outputs=False)
    err = np.abs(np.log10(mine) - np.log10(ref))
    assert err.max() < 5e-5, f"max log10 err {err.max():.2e}"


def test_chord_refactoring_matches_per_step():
    """Chord (stale-Jacobian) stepping with refactor_every=4 must agree
    with per-step refactorization to Newton-convergence accuracy."""
    thickness, nx = 311.0, 64
    params = staub_params()
    init_dN = _ic(thickness, nx)
    t_out = np.linspace(0, 2000, 201)

    s1 = solve_single(init_dN, params, thickness, nx, t_out,
                      hmax=16.0, align_outputs=False, refactor_every=1)
    s4 = solve_single(init_dN, params, thickness, nx, t_out,
                      hmax=16.0, align_outputs=False, refactor_every=4)
    err = np.abs(np.log10(s4) - np.log10(s1))
    assert err.max() < 1e-6, f"max log10 err {err.max():.2e}"


def test_chord_plan_phase_boundary():
    """make_forward_plan must place n_ramp after the last dt change and pad
    the plateau to a multiple of refactor_every."""
    from metrotrpl_tpu.solver.forward import make_forward_plan

    t_out = np.linspace(0, 2000, 201)
    p = make_forward_plan([311.0], [64], ["TRPL"], [t_out], hmax=16.0,
                          align_outputs=False, refactor_every=4)
    assert p.n_ramp is not None
    dt = p.dt[0]
    assert np.allclose(dt[p.n_ramp:], dt[-1])
    assert (p.n_steps - p.n_ramp) % 4 == 0


def test_pallas_interpret_chord_matches_xla():
    """The fused-kernel chord path (interpret mode) reproduces the XLA
    chord path bit-for-bit on the same float32 inputs."""
    import jax
    import jax.numpy as jnp

    from metrotrpl_tpu.solver.forward import make_forward_plan, solve_forward_batch

    # Minimal shapes: the interpret path compiles the PLANES graph, which
    # XLA:CPU builds pathologically slowly (solver/sdirk.py representation
    # note) — nx=16, one Newton iteration, and a 2-step chord block keep
    # the compile tolerable. The chord phase structure under test (ramp /
    # shared-factor blocks / output accumulation) is independent of these
    # sizes.
    thickness, nx = 311.0, 16
    params = staub_params()
    init_dN = _ic(thickness, nx)
    t_out = np.linspace(0, 100, 11)
    plan = make_forward_plan([thickness], [nx], ["TRPL"], [t_out],
                             hmax=16.0, align_outputs=False,
                             refactor_every=2)
    assert plan.n_ramp is not None and plan.n_ramp < plan.n_steps

    B = 8
    pb = {k: jnp.full(B, v, jnp.float32) for k, v in params.items()}
    args = (jnp.asarray(np.tile(init_dN, (B, 1)), jnp.float32), pb,
            jnp.asarray(np.tile(plan.dx, B), jnp.float32),
            jnp.asarray(np.tile(plan.dt, (B, 1)), jnp.float32),
            jnp.asarray(np.tile(plan.out_idx, (B, 1))),
            jnp.asarray(np.tile(plan.is_trpl, B)))
    kw = dict(out_w=jnp.asarray(np.tile(plan.out_w, (B, 1)), jnp.float32),
              refactor_every=plan.refactor_every, n_ramp=plan.n_ramp,
              newton_iters=1)
    sol_x = jax.jit(lambda *a: solve_forward_batch(*a, backend="xla", **kw))(*args)
    sol_p = jax.jit(lambda *a: solve_forward_batch(
        *a, backend="pallas_interpret", block_b=8, **kw))(*args)
    # stacked (xla-on-cpu) vs planes (kernel): same math, reassociated
    # f32 reductions
    np.testing.assert_allclose(np.asarray(sol_p), np.asarray(sol_x),
                               rtol=2e-5)


def test_ramp_block_plan_structure():
    """ramp_block > 1 produces a stepped ramp: dt constant (to knot-sum
    roundoff) within every ramp_block-sized block, n_ramp a block multiple,
    and the per-step envelope never above the smooth ramp's (accuracy can
    only improve)."""
    from metrotrpl_tpu.solver.forward import make_forward_plan

    t_out = np.linspace(0, 2000, 201)
    smooth = make_forward_plan([311.0], [64], ["TRPL"], [t_out], hmax=48.0,
                               align_outputs=False, refactor_every=4)
    for R in (4, 8):
        p = make_forward_plan([311.0], [64], ["TRPL"], [t_out], hmax=48.0,
                              align_outputs=False, refactor_every=4,
                              ramp_block=R)
        assert p.ramp_block == R
        assert p.n_ramp is not None and p.n_ramp % R == 0
        blocks = p.dt[0][:p.n_ramp].reshape(-1, R)
        # knots are accumulated sums, so intra-block dt matches to ULPs,
        # not exactly (the plan's change detection uses the same rtol)
        assert np.all(np.abs(blocks - blocks[:, :1]) < 1e-12 * blocks[:, :1])
        # stepped envelope <= smooth envelope, step for step
        n = min(smooth.n_ramp, p.n_ramp)
        assert np.all(p.dt[0][:n] <= smooth.dt[0][:n] * (1 + 1e-12))


def test_ramp_block_chord_matches_per_step():
    """Chord (stale-factor) stepping INSIDE the stepped ramp must agree
    with per-step refactorization on the same step grid to Newton-
    convergence accuracy (isolates the chord error from the grid change)."""
    import jax.numpy as jnp

    from metrotrpl_tpu.solver.forward import make_forward_plan, solve_forward_batch

    thickness, nx = 311.0, 64
    params = staub_params()
    init_dN = _ic(thickness, nx)
    t_out = np.linspace(0, 2000, 201)
    plan = make_forward_plan([thickness], [nx], ["TRPL"], [t_out], hmax=48.0,
                             align_outputs=False, refactor_every=4,
                             ramp_block=4)
    assert plan.ramp_block == 4

    pb = {k: jnp.asarray([v]) for k, v in params.items()}
    args = (jnp.asarray(init_dN)[None], pb, jnp.asarray(plan.dx),
            jnp.asarray(plan.dt), jnp.asarray(plan.out_idx),
            jnp.asarray(plan.is_trpl))
    kw = dict(out_w=jnp.asarray(plan.out_w), n_ramp=plan.n_ramp,
              refactor_every=plan.refactor_every, backend="xla")
    s_chord = np.asarray(solve_forward_batch(*args, ramp_block=4, **kw))[0]
    s_exact = np.asarray(solve_forward_batch(*args, ramp_block=1, **kw))[0]
    err = np.abs(np.log10(s_chord) - np.log10(s_exact))
    assert err.max() < 1e-5, f"max log10 err {err.max():.2e}"


def test_newton_plateau_plan_structure():
    """newton_plateau stores in the plan, forces the chord phase boundary
    even at refactor_every=1, and normalizes an explicit same-count to
    None (no phase split compiled)."""
    from metrotrpl_tpu.solver.forward import make_forward_plan

    t_out = np.linspace(0, 2000, 201)
    p = make_forward_plan([311.0], [64], ["TRPL"], [t_out], hmax=48.0,
                          align_outputs=False, newton_plateau=1)
    assert p.newton_plateau == 1
    assert p.n_ramp is not None and p.n_ramp < p.n_steps

    same = make_forward_plan([311.0], [64], ["TRPL"], [t_out], hmax=48.0,
                             align_outputs=False, newton_iters=2,
                             newton_plateau=2)
    assert same.newton_plateau is None and same.n_ramp is None


def test_newton_plateau_matches_full_newton():
    """One Newton correction per stage on the FRESH-factor plateau
    (refactor_every=1, newton_plateau=1) must stay within the validated
    h48 chord budget. With STALE factors the single correction is
    under-converged and the error accumulates in the tail — measured
    |dlog10 PL| on this workload: F=1 3.1e-4, F=2 8.5e-4, F=4 1.9e-3
    (scripts/probe_r7_newton.py header) — so pairing newton_plateau=1
    with a chord period is an accuracy trade the user opts into."""
    thickness, nx = 311.0, 64
    params = staub_params()
    init_dN = _ic(thickness, nx)
    t_out = np.linspace(0, 2000, 201)

    kw = dict(hmax=48.0, align_outputs=False)
    s2 = solve_single(init_dN, params, thickness, nx, t_out,
                      refactor_every=4, **kw)
    s1 = solve_single(init_dN, params, thickness, nx, t_out,
                      refactor_every=1, newton_plateau=1, **kw)
    err = np.abs(np.log10(s1) - np.log10(s2))
    assert err.max() < 5e-4, f"max log10 err {err.max():.2e}"


def test_newton_plateau_requires_chord_plan():
    """integrate_observables refuses a plateau Newton count without the
    chord phase boundary instead of silently ignoring it."""
    import jax.numpy as jnp
    import pytest as _pytest

    from metrotrpl_tpu.solver.sdirk import integrate_observables

    y0 = (jnp.ones((1, 8)),)
    with _pytest.raises(ValueError, match="newton_plateau"):
        integrate_observables(
            lambda y: y, lambda y: (y[0].sum(-1), y[0].sum(-1)),
            y0, jnp.full((4, 1), 0.1), newton_iters=2, newton_plateau=1,
            n_ramp=None)


def test_ramp_block_misaligned_grid_degrades_loudly(caplog):
    """An output-aligned grid splits ramp blocks (output knots interleave
    the ramp), so ramp_block > 1 must fall back to per-step ramp
    refactorization with a warning instead of silently chording across a
    dt change."""
    import logging

    from metrotrpl_tpu.solver.forward import make_forward_plan

    t = np.linspace(0, 2000, 101)
    with caplog.at_level(logging.WARNING, logger="MCMC"):
        plan = make_forward_plan(
            [311.0], [24], ["TRPL"], [t], hmax=16.0, align_outputs=True,
            refactor_every=4, ramp_block=4)
    assert plan.ramp_block == 1
    assert any("do not align" in r.message for r in caplog.records)


def test_tail_growth_grid():
    """Stepped-geometric tail (tail_growth): fewer steps, positive monotone
    knots ending exactly at t_final; tail_growth=1 stays bit-identical to
    the flat-plateau grid; refine subdivides every step."""
    from metrotrpl_tpu.physics.grid import plan_time_grid

    t_out = np.linspace(0, 2000, 201)
    flat = plan_time_grid(t_out, hmax=48.0, align_outputs=False)
    same = plan_time_grid(t_out, hmax=48.0, align_outputs=False,
                          tail_growth=1.0, tail_block=1)
    assert np.array_equal(flat.dt, same.dt)
    assert np.array_equal(flat.out_idx, same.out_idx)

    tg = plan_time_grid(t_out, hmax=48.0, align_outputs=False,
                        tail_growth=1.5, tail_block=4)
    assert len(tg.dt) < len(flat.dt)
    assert np.all(tg.dt > 0)
    assert abs(tg.t_solver[-1] - 2000.0) < 1e-6
    assert np.all(np.diff(tg.t_solver) > 0)
    # outputs bracketed: every output time lies within its knot pair
    lo = tg.t_solver[tg.out_idx]
    hi = tg.t_solver[tg.out_idx + 1]
    assert np.all(lo <= t_out + 1e-9) and np.all(t_out <= hi + 1e-9)

    r2 = plan_time_grid(t_out, hmax=48.0, align_outputs=False,
                        tail_growth=1.5, tail_block=4, refine=2)
    assert len(r2.dt) == 2 * len(tg.dt)


def test_plan_time_grid_rejects_nonpositive_hmax():
    """The odeint hmax=0 'no step limit' sentinel must be resolved by
    callers (resolve_solver_mode); plan_time_grid itself requires a
    positive finite bound."""
    from metrotrpl_tpu.physics.grid import plan_time_grid

    t = np.linspace(0, 10, 11)
    for bad in (0.0, -1.0, np.inf):
        with pytest.raises(ValueError, match="hmax"):
            plan_time_grid(t, hmax=bad)


def test_chord_with_geometric_tail_degenerates_loudly(caplog):
    """tail_growth > 1 leaves no constant-dt plateau, so chord mode
    (refactor_every > 1) falls back to per-step refactorization with a
    warning instead of silently."""
    import logging

    from metrotrpl_tpu.solver.forward import make_forward_plan

    t = np.linspace(0, 2000, 101)
    with caplog.at_level(logging.WARNING, logger="MCMC"):
        plan = make_forward_plan(
            [311.0], [24], ["TRPL"], [t], hmax=48.0, align_outputs=False,
            refactor_every=4, tail_growth=1.3, tail_block=4)
    assert plan.n_ramp is None
    assert any("no constant-dt plateau" in r.message for r in caplog.records)


def test_native_rhs_oracle_matches_numpy():
    """The compiled reference RHS (runtime/refrhs.cpp) drives LSODA to the
    same result as the numpy RHS — it is the same math evaluated in the
    same order, so the trajectories should agree to the solver tolerance
    (in practice bit-exactly on this toolchain). Guards the fast
    ``rhs="native"`` path used by scripts/posterior_compare.py's oracle."""
    from metrotrpl_tpu.runtime import make_native_rhs_std

    thickness, nx = 2000.0, 32
    params = staub_params()
    if make_native_rhs_std(nx, thickness / nx, params) is None:
        pytest.skip("native toolchain unavailable")
    init_dN = _ic(thickness, nx)
    t_out = np.linspace(0, 1000, 101)
    a = solve_reference(init_dN, thickness, nx, t_out, params)
    b = solve_reference(init_dN, thickness, nx, t_out, params, rhs="native")
    err = np.abs(np.log10(a) - np.log10(b))
    assert err.max() < 1e-7, f"max log10 err {err.max():.2e}"


def _diag_batch(times, nx=24, hmax=4.0, dtype=None):
    """Small solver batch (one row per entry of ``times``) for the
    with_diag tests."""
    import jax.numpy as jnp

    from metrotrpl_tpu.physics.models import beer_lambert
    from metrotrpl_tpu.solver.forward import make_forward_plan

    dtype = dtype or jnp.float64
    B = len(times)
    lengths = [311.0] * B
    plan = make_forward_plan(lengths, [nx] * B, ["TRPL"] * B, times,
                             hmax=hmax)
    x = jnp.asarray(plan.x_centers, dtype)
    init = beer_lambert(jnp.full((B, 1), 2.12e-3, dtype),
                        jnp.full((B, 1), 6e-3, dtype), x)
    raw = {k: jnp.full(B, v, dtype) for k, v in staub_params().items()}
    return plan, init, raw


def test_with_diag_healthy_resid_small_and_sol_unchanged():
    """with_diag=True returns the identical solution plus a per-row
    Newton-convergence residual that sits far below the failure threshold
    (inference.likelihood.NEWTON_DIV_TOL) for healthy solves — the
    calibration contract of the dynamic failure predicate
    (docs/TPU_NOTES.md round-8)."""
    import jax.numpy as jnp

    from metrotrpl_tpu.inference.likelihood import NEWTON_DIV_TOL
    from metrotrpl_tpu.solver.forward import solve_forward_batch

    plan, init, raw = _diag_batch([np.linspace(0, 50, 9)] * 4)
    args = (init, raw, jnp.asarray(plan.dx), jnp.asarray(plan.dt),
            jnp.asarray(plan.out_idx), jnp.asarray(plan.is_trpl))
    sol = np.asarray(solve_forward_batch(*args))
    sol_d, resid = solve_forward_batch(*args, with_diag=True)
    np.testing.assert_array_equal(np.asarray(sol_d), sol)
    resid = np.asarray(resid)
    assert resid.shape == (4,)
    assert np.all(np.isfinite(resid)) and np.all(resid >= 0)
    # healthy f64 solves converge orders of magnitude below the threshold
    assert resid.max() < NEWTON_DIV_TOL * 1e-2, resid


def test_with_diag_masks_padded_tail():
    """The residual reduce must ignore padded-tail steps past a row's real
    output window (they integrate post-decay garbage by design), while an
    in-window divergence must flag. Rows: A long window, B short window
    whose padding covers A's tail."""
    import jax.numpy as jnp

    from metrotrpl_tpu.solver.forward import solve_forward_batch

    times = [np.linspace(0, 50, 9), np.linspace(0, 10, 3)]
    plan, init, raw = _diag_batch(times)
    kmax_b = int(plan.out_idx[1].max())
    assert kmax_b < plan.n_steps  # row B really has a padded tail

    # poison row B's dt AFTER its last output knot: the state there goes
    # NaN but no output sample reads it — resid must stay clean
    bad_dt = np.array(plan.dt, copy=True)
    bad_dt[1, kmax_b + 1] = np.nan
    args = (init, raw, jnp.asarray(plan.dx), jnp.asarray(bad_dt),
            jnp.asarray(plan.out_idx), jnp.asarray(plan.is_trpl))
    sol, resid = solve_forward_batch(*args, with_diag=True)
    sol, resid = np.asarray(sol), np.asarray(resid)
    assert np.all(np.isfinite(resid)) and resid.max() < 1e-4
    nt_b = len(times[1])
    assert np.all(np.isfinite(sol[1, :nt_b]))

    # poison row B INSIDE its window: resid must flag (non-finite
    # propagates through the masked max), row A must stay clean
    bad_dt2 = np.array(plan.dt, copy=True)
    bad_dt2[1, max(kmax_b - 1, 0)] = np.nan
    args2 = (init, raw, jnp.asarray(plan.dx), jnp.asarray(bad_dt2),
             jnp.asarray(plan.out_idx), jnp.asarray(plan.is_trpl))
    _, resid2 = solve_forward_batch(*args2, with_diag=True)
    resid2 = np.asarray(resid2)
    assert not np.isfinite(resid2[1])
    assert np.isfinite(resid2[0]) and resid2[0] < 1e-4


def test_with_diag_pallas_interpret_resid():
    """The fused Pallas kernel streams the same per-knot residual: healthy
    rows reduce to a tiny finite value and the solution equals the
    diag-free call."""
    import jax
    import jax.numpy as jnp

    from metrotrpl_tpu.solver.forward import solve_forward_batch

    plan, init, raw = _diag_batch([np.linspace(0, 50, 9)] * 8, nx=32,
                                  dtype=jnp.float32)
    args = (init, raw, jnp.asarray(plan.dx, jnp.float32),
            jnp.asarray(plan.dt, jnp.float32), jnp.asarray(plan.out_idx),
            jnp.asarray(plan.is_trpl))
    run = jax.jit(lambda *a: solve_forward_batch(
        *a, backend="pallas_interpret", block_b=8, with_diag=True))
    sol, resid = run(*args)
    resid = np.asarray(resid)
    assert resid.shape == (8,)
    assert np.all(np.isfinite(resid)) and np.all(resid >= 0)
    assert resid.max() < 1e-3  # f32 healthy solves converge well below tol
    sol_plain = jax.jit(lambda *a: solve_forward_batch(
        *a, backend="pallas_interpret", block_b=8))(*args)
    np.testing.assert_array_equal(np.asarray(sol), np.asarray(sol_plain))
