"""Likelihood-layer tests: batched eval semantics, tempering matrix,
failure -> -inf channels, scale factors, pa toy type (reference
test_eval_trial_move.py contracts, fixture-style)."""

import jax.numpy as jnp
import numpy as np
import pytest

from metrotrpl_tpu.inference.likelihood import (
    build_likelihood_plan,
    make_eval_logll,
    search_c_grps,
    u_potential,
)
from metrotrpl_tpu.oracle import solve_reference
from metrotrpl_tpu.oracle.scipy_reference import beer_lambert as bl

UC = {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5, "mu_p": 1e5, "ks": 1e12,
      "Cn": 1e33, "Cp": 1e33, "Sf": 1e-2, "Sb": 1e-2}
NAMES = ["n0", "p0", "mu_n", "mu_p", "ks", "Cn", "Cp", "Sf", "Sb",
         "tauN", "tauP", "eps", "Tm"]
TRUE = {"n0": 1e8, "p0": 3e15, "mu_n": 20, "mu_p": 20, "ks": 4.8e-11,
        "Cn": 4.4e-29, "Cp": 4.4e-29, "Sf": 10, "Sb": 10,
        "tauN": 511, "tauP": 871, "eps": 10, "Tm": 300}


def _param_info(extra_names=(), extra=None):
    names = list(NAMES) + list(extra_names)
    pi = {
        "names": names,
        "unit_conversions": dict(UC),
        "do_log": {n: 1 for n in names},
        "active": {n: 1 for n in names},
        "init_guess": {**TRUE, **(extra or {})},
        "prior_dist": {n: (1e-30, 1e30) for n in names},
        "trial_move": {n: 0.01 for n in names},
    }
    return pi


def _synth(nx=24, thickness=311.0, nt=41, t_end=1000.0, sigma=1.0):
    dx = thickness / nx
    x = np.linspace(dx / 2, thickness - dx / 2, nx)
    t = np.linspace(0, t_end, nt)
    ic = bl(2.12e11 * 1e-14, 6e4 * 1e-7, x)
    pm = {k: v * UC.get(k, 1) for k, v in TRUE.items()}
    pl = solve_reference(ic, thickness, nx, t, pm)
    vals = np.log10(pl)
    uncs = np.full(nt, 0.05)
    sim_info = {"lengths": [thickness], "nx": [nx],
                "meas_types": ["TRPL"], "num_meas": 1}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": sigma}
    e_data = ([t], [vals], [uncs])
    iniPar = np.array([[2.12e11, 6e4, 1]])
    return sim_info, mcmc, e_data, iniPar


def _state(pi, **over):
    vals = {**TRUE, **over}
    return jnp.asarray([[vals.get(n, pi["init_guess"].get(n, 1.0))
                         for n in pi["names"]]])


def test_true_params_give_near_zero_residual():
    sim_info, mcmc, e_data, iniPar = _synth()
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    ev = make_eval_logll(plan)
    out = ev(_state(pi), jnp.asarray([1.0]))
    # data generated from these params: residual == solver-vs-oracle error
    assert out["logll_T"].shape == (1, 1)
    assert float(out["logll_T"][0, 0]) > -1e-4


def test_manual_residual_value_matches():
    """Pinned-math check: logll == -sum(err^2/(sigma^2 T + 2 unc^2)) with
    err from our own forward solve (the reference pins absolute values,
    test_eval_trial_move.py:79; we pin against the closed formula)."""
    from metrotrpl_tpu.solver.forward import solve_single
    sim_info, mcmc, e_data, iniPar = _synth(sigma=0.7)
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    ev = make_eval_logll(plan)
    over = {"tauN": 400.0}
    T = 3.0
    out = ev(_state(pi, **over), jnp.asarray([1.0, T]))

    pm = {k: v * UC.get(k, 1) for k, v in {**TRUE, **over}.items()}
    nx, thickness = 24, 311.0
    dx = thickness / nx
    x = np.linspace(dx / 2, thickness - dx / 2, nx)
    ic = bl(2.12e11 * 1e-14, 6e4 * 1e-7, x)
    sol = solve_single(ic, pm, thickness, nx, e_data[0][0])
    err2 = (np.log10(sol) - e_data[1][0]) ** 2
    for j, temp in enumerate([1.0, T]):
        expect = -np.sum(err2 / (0.7 ** 2 * temp + 2 * e_data[2][0] ** 2))
        np.testing.assert_allclose(float(out["logll_T"][0, j]), expect,
                                   rtol=1e-8)


def test_solver_escalation_rescues_failed_rows():
    """A base step grid that diverges (simulated by a poisoned dt — the
    L-stable scheme fails chaotically, not monotonically, so a NaN step is
    the deterministic stand-in for a too-coarse grid) must be retried on
    the 2x-refined grid before conceding -inf (reference
    converge_simulation, trial_move_evaluation.py:168-210)."""
    import jax

    sim_info, mcmc, e_data, iniPar = _synth()
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    g_idx, fp, fp_hi = plan.fwd[0]
    assert fp_hi is not None and fp_hi.n_steps > fp.n_steps

    clean_ev = jax.jit(make_eval_logll(plan))
    ll_clean = float(clean_ev(_state(pi), jnp.asarray([1.0]))["logll_T"][0, 0])

    bad_dt = np.array(fp.dt, copy=True)
    bad_dt[:, 5] = np.nan
    fp_bad = fp._replace(dt=bad_dt)

    # with escalation: the refined grid rescues the poisoned rows
    plan_esc = plan._replace(fwd=((g_idx, fp_bad, fp_hi),))
    ev = jax.jit(make_eval_logll(plan_esc))
    ll = float(ev(_state(pi), jnp.asarray([1.0]))["logll_T"][0, 0])
    assert np.isfinite(ll)
    assert ll == pytest.approx(ll_clean, abs=1e-3)

    # without escalation: the failure becomes -inf (auto-reject), exactly
    # the pre-escalation semantics
    plan_noesc = plan._replace(fwd=((g_idx, fp_bad, None),))
    ev2 = jax.jit(make_eval_logll(plan_noesc))
    ll2 = float(ev2(_state(pi), jnp.asarray([1.0]))["logll_T"][0, 0])
    assert ll2 == -np.inf


def test_escalation_does_not_rescue_truly_bad_rows():
    """Rows that also fail on the refined grid (NaN parameters) still
    yield -inf, and healthy chains in the same batch are untouched."""
    import jax

    sim_info, mcmc, e_data, iniPar = _synth()
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    ev = jax.jit(make_eval_logll(plan))
    healthy = _state(pi)
    ll_h = float(ev(healthy, jnp.asarray([1.0]))["logll_T"][0, 0])

    states = jnp.concatenate([healthy, healthy.at[0, 0].set(jnp.nan)])
    out = ev(states, jnp.asarray([1.0]))["logll_T"]
    assert float(out[0, 0]) == pytest.approx(ll_h, rel=1e-12)
    assert float(out[1, 0]) == -np.inf


def test_refine_for_tols_mapping():
    """Config rtol/atol map onto the fixed-step refine factor via the
    measured accuracy model (VERDICT r1 missing #5)."""
    import logging

    from metrotrpl_tpu.solver.forward import refine_for_tols

    logger = logging.getLogger("test_refine")
    assert refine_for_tols(None) == 1
    # reference default rtol=1e-7: equivalent global target ~2e-6 at 500
    # steps, already met at refine=1
    assert refine_for_tols(1e-7, 1e-10, n_steps=500, logger=logger) == 1
    assert refine_for_tols(1e-5, n_steps=500) == 1
    # tighter tolerance buys refinement...
    assert refine_for_tols(1e-8, n_steps=500) > 1
    # ...but is clamped to the finest validated grid
    assert refine_for_tols(1e-15, n_steps=500, logger=logger) == 4


def test_time_cutoff_halves_logll():
    """Halving the compared window ~halves the summed residual (reference
    test_eval_trial_move.py:145-208 contract)."""
    sim_info, mcmc, e_data, iniPar = _synth(nt=41)
    pi = _param_info()
    t, v, u = e_data
    e_half = ([t[0][:21]], [v[0][:21]], [u[0][:21]])
    sim_half = dict(sim_info)
    plan_full = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    plan_half = build_likelihood_plan(sim_half, pi, mcmc, e_half, iniPar)
    st = _state(pi, tauN=300.0)
    temps = jnp.asarray([1.0])
    ll_full = float(make_eval_logll(plan_full)(st, temps)["logll_T"][0, 0])
    ll_half = float(make_eval_logll(plan_half)(st, temps)["logll_T"][0, 0])
    assert ll_half > ll_full  # fewer residual terms -> larger (less negative)


def test_scale_factor_drives_logll_to_zero():
    """A fitted scale factor equal to the data offset nulls the residual
    (reference test_eval_trial_move.py:210-279 contract)."""
    sim_info, mcmc, e_data, iniPar = _synth()
    shift = 0.8  # data multiplied by 10^0.8
    t, v, u = e_data
    e_shift = ([t[0]], [v[0] + shift], [u[0]])
    mcmc = dict(mcmc)
    mcmc["scale_factor"] = [0.1, np.array([0]), None, [1.0]]
    pi = _param_info(extra_names=["_s0"], extra={"_s0": 1.0})
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_shift, iniPar)
    ev = make_eval_logll(plan)
    temps = jnp.asarray([1.0])
    ll_wrong = float(ev(_state(pi, _s0=1.0), temps)["logll_T"][0, 0])
    ll_right = float(ev(_state(pi, _s0=10 ** shift), temps)["logll_T"][0, 0])
    assert ll_right > ll_wrong
    assert ll_right > -1e-4


def test_fittable_fluence_changes_initial_condition():
    sim_info, mcmc, e_data, iniPar = _synth()
    mcmc = dict(mcmc)
    mcmc["fittable_fluences"] = [0.1, np.array([0]), None, [1.0]]
    pi = _param_info(extra_names=["_f0"], extra={"_f0": 1.0})
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    ev = make_eval_logll(plan)
    temps = jnp.asarray([1.0])
    ll_1 = float(ev(_state(pi, _f0=1.0), temps)["logll_T"][0, 0])
    ll_3 = float(ev(_state(pi, _f0=3.0), temps)["logll_T"][0, 0])
    assert ll_1 > -1e-4          # matching fluence reproduces data
    assert ll_3 < ll_1 - 10      # 3x fluence badly off


def test_nan_failure_gives_neg_inf():
    """A solve that produces NaN maps to -inf logll (the reference's
    exception -> -inf channel, trial_move_evaluation.py:70-72,159-166).
    The implicit stepper is robust enough that merely unphysical params
    (negative lifetimes) give finite-but-terrible logll rather than NaN,
    so drive the channel with a NaN parameter directly."""
    sim_info, mcmc, e_data, iniPar = _synth()
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    ev = make_eval_logll(plan)
    st = _state(pi, tauN=np.nan)
    ll = float(ev(st, jnp.asarray([1.0]))["logll_T"][0, 0])
    assert ll == -np.inf
    # and unphysical params still get strongly penalized, not accepted
    ll_bad = float(ev(_state(pi, tauN=-1.0, tauP=-1.0),
                      jnp.asarray([1.0]))["logll_T"][0, 0])
    assert ll_bad < -1e3


def test_batched_chains_match_individual_evals():
    sim_info, mcmc, e_data, iniPar = _synth()
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    ev = make_eval_logll(plan)
    temps = jnp.asarray([1.0, 2.0])
    s1 = _state(pi, tauN=300.0)
    s2 = _state(pi, tauN=700.0)
    both = jnp.concatenate([s1, s2], axis=0)
    out_b = np.asarray(ev(both, temps)["logll_T"])
    out_1 = np.asarray(ev(s1, temps)["logll_T"])
    out_2 = np.asarray(ev(s2, temps)["logll_T"])
    np.testing.assert_allclose(out_b[0], out_1[0], rtol=1e-12)
    np.testing.assert_allclose(out_b[1], out_2[0], rtol=1e-12)


def test_pa_toy_measurement():
    """'pa' type: logll = -U(x)/T (reference utils.py U + eval path)."""
    sim_info = {"lengths": [1], "nx": [1], "meas_types": ["pa"],
                "num_meas": 1}
    pi = {
        "names": ["x0"],
        "unit_conversions": {},
        "do_log": {"x0": 0},
        "active": {"x0": 1},
        "init_guess": {"x0": 0.0},
        "prior_dist": {"x0": (-2, 2)},
        "trial_move": {"x0": 0.1},
    }
    mcmc = {"ini_mode": "density", "model": "std", "log_y": 1,
            "model_uncertainty": 1}
    e_data = ([np.array([0.0])], [np.array([0.0])], [np.array([1.0])])
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data,
                                 np.zeros((1, 1)))
    ev = make_eval_logll(plan)
    x = 0.3
    out = ev(jnp.asarray([[x]]), jnp.asarray([1.0, 2.0]))
    u = 3 * (1 + np.sin(2 * np.pi * x))
    np.testing.assert_allclose(np.asarray(out["logll_T"][0]),
                               [-u, -u / 2], rtol=1e-12)
    # outside the well -> +inf potential -> -inf logll
    out2 = ev(jnp.asarray([[2.5]]), jnp.asarray([1.0]))
    assert float(out2["logll_T"][0, 0]) == -np.inf


def test_u_potential_piecewise():
    xs = np.array([-1.5, -0.5, 0.5, 1.0, 1.9])
    mult = np.array([1, 2, 3, 4, 5])
    expect = mult * (1 + np.sin(2 * np.pi * xs))
    np.testing.assert_allclose(np.asarray(u_potential(jnp.asarray(xs))),
                               expect, rtol=1e-12)


def test_search_c_grps():
    assert search_c_grps([(0, 2, 4), (1, 3)], 4) == 0
    assert search_c_grps([(0, 2, 4), (1, 3)], 3) == 1
    assert search_c_grps([(0, 2)], 5) == 5
    assert search_c_grps(None, 7) == 7


def test_heterogeneous_nx_groups():
    """Measurements with different nx batch into separate solve groups and
    match per-measurement single solves (reference allows per-measurement
    nx, MCMC_script_writer.py:48)."""
    from metrotrpl_tpu.solver.forward import solve_single

    pi = _param_info()
    pm = {k: v * UC.get(k, 1) for k, v in TRUE.items()}
    t1 = np.linspace(0, 400, 31)
    t2 = np.linspace(0, 600, 41)
    specs = [(311.0, 24, t1), (2000.0, 32, t2)]
    curves = []
    for th, nx, t in specs:
        dx = th / nx
        x = np.linspace(dx / 2, th - dx / 2, nx)
        ic = bl(2.12e11 * 1e-14, 6e4 * 1e-7, x)
        curves.append(solve_single(ic, pm, th, nx, t))
    sim_info = {"lengths": [311.0, 2000.0], "nx": [24, 32],
                "meas_types": ["TRPL", "TRPL"], "num_meas": 2}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": 1}
    e_data = ([t1, t2], [np.log10(c) for c in curves],
              [np.full(len(t1), 0.05), np.full(len(t2), 0.05)])
    iniPar = np.array([[2.12e11, 6e4, 1]] * 2)
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    assert len(plan.fwd) == 2  # two nx groups
    ev = make_eval_logll(plan)
    out = ev(_state(pi), jnp.asarray([1.0]))
    # data generated with the same solver -> residual ~ 0 per measurement
    per = np.asarray(out["per_meas"][0, :, 0])
    assert per.shape == (2,)
    assert np.all(per > -1e-6), per

    # density mode with mixed nx is rejected (unloadable in the reference)
    mcmc_d = dict(mcmc, ini_mode="density")
    with pytest.raises(NotImplementedError):
        build_likelihood_plan(sim_info, pi, mcmc_d, e_data,
                              np.zeros((2, 32)))


def test_deferred_escalation_counts_and_rerun_matches_inline():
    """escalate="off" must COUNT diverged solves (n_solver_fail) instead of
    retrying; re-running the same MH window through an escalate="inline"
    kernel from the same inputs then reproduces the retried results — the
    deferred-escalation contract used by run_mh (the inline lax.cond costs
    ~10 ms/call on TPU even when never taken, docs/TPU_NOTES.md)."""
    import jax

    from metrotrpl_tpu.inference.metropolis import build_mh_kernel
    from metrotrpl_tpu.inference.moves import build_move_plan

    sim_info, mcmc, e_data, iniPar = _synth()
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    g_idx, fp, fp_hi = plan.fwd[0]
    bad_dt = np.array(fp.dt, copy=True)
    bad_dt[:, 5] = np.nan
    plan_bad = plan._replace(fwd=((g_idx, fp._replace(dt=bad_dt), fp_hi),))

    # eval level: "off" counts the diverged row, "inline" repairs it
    ev_off = jax.jit(make_eval_logll(plan_bad, escalate="off"))
    out = ev_off(_state(pi), jnp.asarray([1.0]))
    assert int(out["n_solver_fail"]) == 1
    assert float(out["logll_T"][0, 0]) == -np.inf
    ev_in = jax.jit(make_eval_logll(plan_bad, escalate="inline"))
    out_in = ev_in(_state(pi), jnp.asarray([1.0]))
    assert int(out_in["n_solver_fail"]) == 0
    assert np.isfinite(float(out_in["logll_T"][0, 0]))

    # window level: same inputs through off/inline kernels — off reports
    # failures, inline's re-run is the corrected window
    mcmc2 = dict(mcmc, hard_bounds=1)
    pi2 = _param_info()
    mp = build_move_plan(pi2, mcmc2)
    base_move = np.array(
        [0.05 if pi2["active"][n] else 0.0 for n in pi2["names"]])
    kw = dict(temps=np.ones(2), base_trial_move=base_move, temper_freq=5,
              do_tempering=False, window=3)
    k_off = build_mh_kernel(plan_bad, mp, escalate="off", **kw)
    k_in = build_mh_kernel(plan_bad, mp, escalate="inline", **kw)
    states = jnp.concatenate([_state(pi2), _state(pi2, tauN=480.0)])
    ll0 = k_in.init_ll(states)   # finite entry ll (repaired)
    key = jax.random.PRNGKey(11)
    out_off = k_off.run_window(states, ll0, jnp.asarray(1), key)
    out_in = k_in.run_window(states, ll0, jnp.asarray(1), key)
    assert int(out_off[4]) > 0          # every proposal's solve diverged
    assert int(out_in[4]) == 0
    # off: all proposals -inf -> nothing accepted; inline: walk proceeds
    assert np.asarray(out_off[5][2]).sum() == 0
    assert np.isfinite(np.asarray(out_in[1])).all()


def test_scalar_likel2move_ratio_accepted():
    """Config validation accepts a numeric likel2move_ratio; the plan and
    the Ensemble must both honor the scalar form (it used to crash with
    'float is not subscriptable' in metro())."""
    sim_info, mcmc, e_data, iniPar = _synth()
    mcmc = dict(mcmc)
    del mcmc["model_uncertainty"]
    mcmc["likel2move_ratio"] = 100.0
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    np.testing.assert_allclose(plan.sigma, 0.01 * 100.0)

    mcmc["likel2move_ratio"] = {"TRPL": 100.0}
    plan_d = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    np.testing.assert_allclose(plan_d.sigma, plan.sigma)


def test_eval_chunked_non_divisible_batch():
    """Chunked evaluation must stay chunked (and correct) when the batch
    size is not a multiple of eval_chunk (it used to silently fall back
    to one full unchunked evaluation)."""
    sim_info, mcmc, e_data, iniPar = _synth(nx=16, nt=11, t_end=100.0)
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    K = 5
    states = jnp.concatenate([_state(pi)] * K, axis=0)
    temps = jnp.ones(1)
    full = make_eval_logll(plan)(states, temps)
    chunked = make_eval_logll(plan, eval_chunk=2)(states, temps)
    np.testing.assert_allclose(np.asarray(chunked["logll_T"]),
                               np.asarray(full["logll_T"]), rtol=1e-6)
    assert chunked["logll_T"].shape == (K, 1)


def test_mu_constraint_requires_log_mobilities():
    """The ambipolar constraint operates in log10 space (as in the
    reference); combining it with a linear-space mobility must fail
    loudly instead of silently corrupting proposals."""
    from metrotrpl_tpu.inference.moves import build_move_plan

    pi = _param_info()
    pi["do_mu_constraint"] = [20.0, 3.0]
    pi["do_log"] = dict(pi["do_log"])
    pi["do_log"]["mu_n"] = 0
    with pytest.raises(ValueError, match="do_mu_constraint requires"):
        build_move_plan(pi, {})


def test_newton_divergence_predicate_wiring():
    """The dynamic Newton-convergence predicate (NEWTON_DIV_TOL,
    docs/TPU_NOTES.md round-8) feeds the solver-failure decision through
    the per-plan ``newton_div_tol`` knob (VERDICT r3 weak #4): with an
    impossible threshold every row flags (and, surviving escalation,
    concedes -inf); with the calibrated default a healthy solve passes
    untouched and reports its residual diagnostic."""
    import metrotrpl_tpu.inference.likelihood as L

    sim_info, mcmc, e_data, iniPar = _synth()
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)
    # None = resolve per nx-group at eval time (ADVICE r4 #2); this
    # synth workload is nx=24, so the effective tol is the coarse-grid
    # calibration value
    assert plan.newton_div_tol is None
    assert L.newton_div_tol_default(plan.fwd[0][1].nx) == L.NEWTON_DIV_TOL

    out = make_eval_logll(plan)(_state(pi), jnp.asarray([1.0]))
    assert np.isfinite(float(out["logll_T"][0, 0]))
    assert out["resid"].shape == (1, 1)
    r = float(out["resid"][0, 0])
    assert 0 <= r < L.NEWTON_DIV_TOL
    assert int(out["n_solver_fail"]) == 0

    # impossible threshold: resid >= 0 always flags; the escalated
    # re-solve can't pass it either, so the row concedes -inf
    plan_neg = plan._replace(newton_div_tol=-1.0)
    out2 = make_eval_logll(plan_neg)(_state(pi), jnp.asarray([1.0]))
    assert float(out2["logll_T"][0, 0]) == -np.inf
    assert int(out2["n_solver_fail"]) == 1

    # the MCMC_fields config key reaches the plan (script/TOML knob)
    plan_cfg = build_likelihood_plan(
        sim_info, pi, dict(mcmc, newton_div_tol=0.5), e_data, iniPar)
    assert plan_cfg.newton_div_tol == 0.5


def test_newton_div_tol_clamped_below_damping_cap():
    """A tolerance at/above the Newton damping cap can never flag (damped
    residuals pin at the cap), so the direct API clamps it with a warning
    and config validation rejects it outright (ADVICE r4 #3)."""
    from metrotrpl_tpu.config.validate import validate_MCMC_fields
    from metrotrpl_tpu.solver.sdirk import NEWTON_DAMP

    sim_info, mcmc, e_data, iniPar = _synth()
    pi = _param_info()
    plan = build_likelihood_plan(
        sim_info, pi, dict(mcmc, newton_div_tol=NEWTON_DAMP + 1),
        e_data, iniPar)
    assert plan.newton_div_tol == 0.5 * NEWTON_DAMP

    fields = {"init_cond_path": "a", "measurement_path": "b",
              "output_path": "c", "num_iters": 10, "solver": ("sdirk",),
              "model": "std", "ini_mode": "fluence", "log_y": 1,
              "checkpoint_freq": 5, "model_uncertainty": 1.0,
              "newton_div_tol": float(NEWTON_DAMP)}
    with pytest.raises(ValueError, match="damping cap"):
        validate_MCMC_fields(fields, 1, supported_solvers=("sdirk",))


def test_escalation_gate_includes_scale_factor():
    """The escalation gate's fit-distance score must apply the fitted
    scale factor before comparing to the data (ADVICE r4 #1): a state
    whose curve matches the data AFTER a 10^0.8 scale shift is a good
    fit (score ~ 0, gate open), not a hopeless one."""
    sim_info, mcmc, e_data, iniPar = _synth()
    shift = 0.8
    t, v, u = e_data
    e_shift = ([t[0]], [v[0] + shift], [u[0]])
    mcmc = dict(mcmc)
    mcmc["scale_factor"] = [0.1, np.array([0]), None, [1.0]]
    pi = _param_info(extra_names=["_s0"], extra={"_s0": 1.0})
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_shift, iniPar)
    ev = make_eval_logll(plan)
    temps = jnp.asarray([1.0])
    score_right = float(
        ev(_state(pi, _s0=10 ** shift), temps)["esc_score"][0, 0])
    score_unscaled = float(
        ev(_state(pi, _s0=1.0), temps)["esc_score"][0, 0])
    from metrotrpl_tpu.inference.likelihood import ESCALATE_GATE_SCORE
    # perfect fit after scaling -> score ~ solver error, far below gate
    assert score_right < 1e-6
    # without the factor applied the raw distance is ~shift^2 = 0.64,
    # which the pre-fix gate would have misread as hopeless
    assert score_unscaled > ESCALATE_GATE_SCORE


def test_f64_escalation_rung_at_fine_grids():
    """At nx >= 96 with x64 enabled, the escalation rung is the
    f64-emulated refine-2 solve on the XLA path (probe_r14_ridge64: the
    f32 damped Newton pins at the cap on the stiff thin-sample rows at
    high mobility at EVERY f32 rung, while emulated f64 at the fast
    envelope matches LSODA to |dll| <= 0.084 at the flagship ridge
    states). With x64 off the rung falls back to the f32 h<=16 ladder."""
    import jax

    sim_info, mcmc, e_data, iniPar = _synth(nx=96)
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar,
                                 hmax=48.0, align_outputs=False,
                                 refactor_every=4)
    _, fp, fp_hi = plan.fwd[0]
    assert fp.solve_dtype is None
    assert fp_hi.solve_dtype == "float64"
    assert fp_hi.refactor_every == 1  # chord-free: small compilable body

    with jax.enable_x64(False):
        plan32 = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar,
                                       hmax=48.0, align_outputs=False,
                                       refactor_every=4)
    assert plan32.fwd[0][2].solve_dtype is None

    # explicit inf disables the predicate without the cap clamp
    plan_inf = build_likelihood_plan(
        sim_info, pi, mcmc, e_data, iniPar, newton_div_tol=np.inf)
    assert plan_inf.newton_div_tol == np.inf


def test_mu_trigger_fires_f64_rung():
    """The high-mobility structural trigger (ESCALATE_MU_MODEL, 40
    cm^2/Vs): at nx>=96 a state above the threshold counts as
    repair-needing in the escalate-free hot kernel (its deferred re-run
    must fire — the f32 fast solve there can be decades-wrong with a
    sub-tolerance residual, probe_r16), repairs cleanly under inline,
    and a low-mobility state fires nothing."""
    import jax

    sim_info, mcmc, e_data, iniPar = _synth(nx=96, nt=11, t_end=200.0)
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar,
                                 hmax=48.0, align_outputs=False,
                                 refactor_every=4)
    assert plan.fwd[0][2].solve_dtype == "float64"
    ev_off = jax.jit(make_eval_logll(plan, escalate="off"))
    ev_in = jax.jit(make_eval_logll(plan, escalate="inline"))
    temps = jnp.asarray([1.0])

    lo = ev_off(_state(pi, mu_n=20.0, mu_p=20.0), temps)
    assert int(lo["n_solver_fail"]) == 0
    hi = ev_off(_state(pi, mu_n=60.0, mu_p=20.0), temps)
    assert int(hi["n_solver_fail"]) >= 1  # deferred re-run must fire
    hi_in = ev_in(_state(pi, mu_n=60.0, mu_p=20.0), temps)
    assert int(hi_in["n_solver_fail"]) == 0  # repaired, not conceded
    assert np.isfinite(float(hi_in["logll_T"][0, 0]))


def test_wide_ball_escalation_zero_concessions():
    """A +/-0.3-dex off-truth ball — the regime where the Newton
    predicate false-positives on ~half of healthy states — must end with
    ZERO -inf concessions under inline escalation (f32, fast mode): the
    escalated h4/refine2/chord-free re-solve repairs every flagged row
    (VERDICT r3 next #4)."""
    import jax

    sim_info, mcmc, e_data, iniPar = _synth()
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar,
                                 hmax=48.0, align_outputs=False,
                                 refactor_every=4)
    rng = np.random.default_rng(7)
    names = pi["names"]
    base = np.array([TRUE[n] for n in names])
    active = np.array([n not in ("n0", "eps", "Tm") for n in names])
    states = np.tile(base, (16, 1)) * 10.0 ** (
        rng.uniform(-0.3, 0.3, (16, len(names))) * active[None, :])
    out = jax.jit(make_eval_logll(plan, dtype=jnp.float32,
                                  escalate="inline"))(
        jnp.asarray(states, jnp.float32), jnp.asarray([1.0]))
    assert int(out["n_solver_fail"]) == 0
    assert np.isfinite(np.asarray(out["logll_T"])).all()


def test_fail_states_per_state_counts():
    """fail_states reports diverged solves PER STATE so multi-ensemble
    drivers can escalate at per-ensemble granularity (VERDICT r3 weak
    #3): a batch mixing a healthy state with a poisoned one counts only
    the poisoned row."""
    import jax

    sim_info, mcmc, e_data, iniPar = _synth()
    pi = _param_info()
    plan = build_likelihood_plan(sim_info, pi, mcmc, e_data, iniPar)

    states = jnp.concatenate([
        _state(pi), _state(pi, tauN=np.nan), _state(pi, tauN=480.0)])
    out = jax.jit(make_eval_logll(plan, escalate="off"))(
        states, jnp.asarray([1.0]))
    np.testing.assert_array_equal(np.asarray(out["fail_states"]),
                                  [0, 1, 0])
    assert int(out["n_solver_fail"]) == 1
