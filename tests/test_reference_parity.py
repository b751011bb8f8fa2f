"""Reference-pinned likelihood parity.

The reference pins exact log-likelihood values for fixed fixtures
(reference Tests/test_eval_trial_move.py): a bare two-measurement TRPL run
(-59340.105083 and -32560.139058, :79-80), time-cutoff halving (-45982,
:204-208), per-measurement scale factors driving logll -> 0 (:276-279),
mixed TRPL+TRTS with per-type sigma (-517.98 for the TRTS half, :340-341),
and carrier-depletion monotonicity under force_min_y (:82-143).

These tests reproduce those fixtures through THIS framework's pipeline
(config dicts -> build_likelihood_plan -> batched SDIRK solve -> masked
likelihood) and assert the REFERENCE'S pinned constants to the reference's
own tolerance (decimal=0, i.e. < 0.5 absolute — the values are O(1e4-1e5),
so this is ~1e-5 relative). Any semantic drift in the data transform,
solver, observable math, or tempered-likelihood formula fails these.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrotrpl_tpu.inference.likelihood import (
    build_likelihood_plan,
    make_eval_logll,
)

# Reference fixture vocabulary (test_eval_trial_move.py:34-38)
PARAM_NAMES = ["n0", "p0", "mu_n", "mu_p", "ks", "Cn", "Cp", "Tm",
               "Sf", "Sb", "tauN", "tauP", "eps", "m"]
UNIT_CONVERSIONS = {"n0": ((1e-7) ** 3), "p0": ((1e-7) ** 3),
                    "mu_n": ((1e7) ** 2) / (1e9),
                    "mu_p": ((1e7) ** 2) / (1e9),
                    "ks": ((1e7) ** 3) / (1e9), "Sf": 1e-2, "Sb": 1e-2}
# test_eval_trial_move.py:45-58 — zero-transport, radiative-only material
BASE_GUESS = {"n0": 0, "p0": 0, "mu_n": 0, "mu_p": 0, "ks": 1e-11,
              "Sf": 0, "Sb": 0, "Cn": 0, "Cp": 0, "Tm": 300,
              "tauN": 1e99, "tauP": 1e99, "eps": 10, "m": 1}


def _param_info(guess, names=None):
    names = list(names or PARAM_NAMES)
    return {
        "names": names,
        "unit_conversions": dict(UNIT_CONVERSIONS),
        "active": {n: 0 for n in names},
        "init_guess": dict(guess),
        "trial_move": {n: 0 for n in names},
    }


def _eval_fixture(sim_info, param_info, mcmc, e_data, iniPar):
    """Run one likelihood evaluation at T=1 exactly as the walk would."""
    plan = build_likelihood_plan(sim_info, param_info, mcmc, e_data, iniPar)
    ev = jax.jit(make_eval_logll(plan, dtype=jnp.float64))
    names = param_info["names"]
    state = jnp.asarray(
        [[param_info["init_guess"][n] for n in names]], jnp.float64)
    out = ev(state, jnp.ones(1, jnp.float64))
    per_meas = np.asarray(out["per_meas"])[0, :, 0]
    return float(np.asarray(out["logll_T"])[0, 0]), per_meas


def test_pinned_logll_two_trpl():
    """reference test_eval_trial_move.py:21-80 — pinned -59340.105083 and
    -32560.139058 for two uniform-profile radiative-decay TRPL sims."""
    nx = 128
    sim_info = {"lengths": [2000, 2000], "nx": [nx, nx],
                "meas_types": ["TRPL", "TRPL"], "num_meas": 2}
    iniPar = np.array([1e15 * np.ones(nx), 1e16 * np.ones(nx)])
    nt = 1000
    times = [np.linspace(0, 100, nt + 1)] * 2
    vals = [np.ones(nt + 1) * 23] * 2
    uncs = [np.ones(nt + 1) * 1e-99] * 2
    mcmc = {"solver": ("solveivp",), "model": "std", "ini_mode": "density",
            "hmax": 4, "log_y": 1, "model_uncertainty": {"TRPL": 1}}

    logll, per_meas = _eval_fixture(
        sim_info, _param_info(BASE_GUESS), mcmc,
        (times, vals, uncs), iniPar)

    np.testing.assert_almost_equal(per_meas[0], -59340.105083, decimal=0)
    np.testing.assert_almost_equal(per_meas[1], -32560.139058, decimal=0)
    np.testing.assert_almost_equal(
        logll, np.sum([-59340.105083, -32560.139058]), decimal=0)


def test_pinned_logll_time_cutoff():
    """reference test_eval_trial_move.py:145-208 — data truncated to [0, 50]
    pins -45982 (about half of the full-range value)."""
    nx = 128
    sim_info = {"lengths": [2000, 2000], "nx": [nx, nx],
                "meas_types": ["TRPL", "TRPL"], "num_meas": 2}
    iniPar = np.array([1e15 * np.ones(nx), 1e16 * np.ones(nx)])
    nt = 500
    times = [np.linspace(0, 50, nt + 1)] * 2
    vals = [np.ones(nt + 1) * 23] * 2
    uncs = [np.ones(nt + 1) * 1e-99] * 2
    mcmc = {"solver": ("solveivp",), "model": "std", "ini_mode": "density",
            "hmax": 4, "log_y": 1, "model_uncertainty": {"TRPL": 1}}

    logll, per_meas = _eval_fixture(
        sim_info, _param_info(BASE_GUESS), mcmc,
        (times, vals, uncs), iniPar)
    np.testing.assert_almost_equal(logll, -45982, decimal=0)


def test_pinned_logll_scale_factors_perfect_fit():
    """reference test_eval_trial_move.py:210-279 — per-measurement scale
    factors chosen to cancel both offsets drive logll to 0."""
    nx = 128
    sim_info = {"lengths": [2000, 2000], "nx": [nx, nx],
                "meas_types": ["TRPL", "TRPL"], "num_meas": 2}
    iniPar = np.array([1e15 * np.ones(nx), 1e16 * np.ones(nx)])
    guess = dict(BASE_GUESS)
    guess["ks"] = 1e-20  # near-static sims: PL = ks * integral(N*P)
    guess["_s0"] = 2e-17 ** -1
    guess["_s1"] = 2e-15 ** -1
    names = PARAM_NAMES + ["_s0", "_s1"]
    nt = 1000
    times = [np.linspace(0, 100, nt + 1)] * 2
    vals = [np.ones(nt + 1) * 23] * 2
    uncs = [np.ones(nt + 1) * 1e-99] * 2
    mcmc = {"solver": ("solveivp",), "model": "std", "ini_mode": "density",
            "hmax": 4, "log_y": 1, "model_uncertainty": {"TRPL": 1},
            "scale_factor": [0.02, [0, 1], None, [1, 1]]}

    logll, _ = _eval_fixture(
        sim_info, _param_info(guess, names), mcmc,
        (times, vals, uncs), iniPar)
    np.testing.assert_almost_equal(logll, 0, decimal=0)


def test_pinned_logll_mixed_trpl_trts():
    """reference test_eval_trial_move.py:281-341 — mixed measurement types
    with per-type model uncertainty pin -59340.105083 (TRPL, sigma=1) and
    -517.98 (TRTS, sigma=10)."""
    nx = 128
    sim_info = {"lengths": [2000, 2000], "nx": [nx, nx],
                "meas_types": ["TRPL", "TRTS"], "num_meas": 2}
    iniPar = np.array([1e15 * np.ones(nx), 1e15 * np.ones(nx)])
    guess = dict(BASE_GUESS)
    guess["mu_n"] = 0.01
    guess["mu_p"] = 0.01
    nt = 1000
    times = [np.linspace(0, 100, nt + 1)] * 2
    vals = [np.ones(nt + 1) * 23, np.ones(nt + 1) * -2]
    uncs = [np.ones(nt + 1) * 1e-99] * 2
    mcmc = {"solver": ("solveivp",), "model": "std", "ini_mode": "density",
            "hmax": 4, "log_y": 1,
            "model_uncertainty": {"TRPL": 1, "TRTS": 10}}

    logll, per_meas = _eval_fixture(
        sim_info, _param_info(guess), mcmc, (times, vals, uncs), iniPar)
    np.testing.assert_almost_equal(per_meas[0], -59340.105083, decimal=0)
    np.testing.assert_almost_equal(per_meas[1], -517.98, decimal=0)
    np.testing.assert_almost_equal(
        logll, np.sum([-59340.105083, -517.98]), decimal=0)


def test_depletion_monotonicity_with_force_min_y():
    """reference test_eval_trial_move.py:82-143 — with force_min_y, a small
    move of the SRH lifetimes toward the data's true decay must improve the
    likelihood even when carriers deplete to the noise floor."""
    nx = 128
    sim_info = {"lengths": [2000], "nx": [nx], "meas_types": ["TRPL"],
                "num_meas": 1}
    iniPar = np.array([1e15 * np.ones(nx)])
    nt = 1000
    times = [np.linspace(0, 100, nt + 1)]
    vals = [np.log10(2e14 * np.exp(-times[0] / 8))]
    uncs = [np.ones(nt + 1) * 1e-99]
    mcmc = {"solver": ("solveivp",), "model": "std", "ini_mode": "density",
            "hmax": 4, "log_y": 1, "force_min_y": 1,
            "model_uncertainty": {"TRPL": 1}}

    guess = dict(BASE_GUESS)
    guess.update(n0=1e8, p0=1e17, ks=1e-13, tauN=4, tauP=4)
    ll1, _ = _eval_fixture(sim_info, _param_info(guess), mcmc,
                           (times, vals, uncs), iniPar)

    guess.update(tauN=4.01, tauP=4.01)
    ll2, _ = _eval_fixture(sim_info, _param_info(guess), mcmc,
                           (times, vals, uncs), iniPar)
    assert np.isfinite(ll1) and np.isfinite(ll2)
    assert ll2 > ll1
