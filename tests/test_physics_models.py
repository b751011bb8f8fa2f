"""Physics-layer tests: scaled RHS equivalence with the float64 oracle,
E-field init, Beer-Lambert, observables, and analytic-limit behavior.

Mirrors the reference's solver test strategy (reference
test_forward_solver.py: dydt twins equivalence + analytic-limit oracles).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from metrotrpl_tpu.constants import eps0, q_C
from metrotrpl_tpu.oracle import (
    calculate_pl,
    calculate_trts,
    dydt_std,
    dydt_traps,
    efield_init,
)
from metrotrpl_tpu.oracle.scipy_reference import beer_lambert as bl_np
from metrotrpl_tpu.physics.models import (
    beer_lambert,
    initial_state,
    make_scaled_params,
    observable_multipliers,
    observables_std,
    rhs_std,
    rhs_traps,
)

STAUB = {
    "n0": 1e8 * 1e-21, "p0": 3e15 * 1e-21,
    "mu_n": 20 * 1e5, "mu_p": 20 * 1e5,
    "ks": 4.8e-11 * 1e12, "Cn": 4.4e-29 * 1e33, "Cp": 4.4e-29 * 1e33,
    "Sf": 10 * 1e-2, "Sb": 10 * 1e-2,
    "tauN": 511.0, "tauP": 871.0, "eps": 10.0, "Tm": 300.0,
    "kC": 1e-12, "Nt": 1e14 * 1e-21, "tauE": 200.0,
}


def _setup(nx=24, thickness=311.0, rngseed=7):
    rng = np.random.default_rng(rngseed)
    dx = thickness / nx
    x = np.linspace(dx / 2, thickness - dx / 2, nx)
    init_dN = bl_np(2.12e11 * 1e-14, 6e4 * 1e-7, x)
    # perturb so dN != dP and E != 0 (general-position state)
    dN = init_dN * (1 + 0.1 * rng.standard_normal(nx))
    dP = init_dN * (1 + 0.1 * rng.standard_normal(nx))
    return dx, x, dN, dP


def _scaled_state_from(dN, dP, E_int, ns, lam, dx, model="std", Ntr=None):
    """Component-first state (C, nx) in antisymmetric-split components
    (dN, [Ntrap,] dD = dP - dN, E_shifted)."""
    e_scale = lam * dx * ns
    cols = [dN / ns]
    if model == "traps":
        cols.append((Ntr if Ntr is not None else np.zeros_like(dN)) / ns)
    cols.append((dP - dN) / ns)
    E_pad = np.concatenate([E_int / e_scale, [0.0]])
    cols.append(E_pad)
    return jnp.asarray(np.stack(cols, axis=0))


@pytest.mark.parametrize("model", ["std", "traps"])
def test_rhs_matches_oracle(model):
    """Scaled excess-density RHS == reference-math RHS after unscaling."""
    nx = 24
    dx, x, dN, dP = _setup(nx)
    p = STAUB
    lam = q_C / (p["eps"] * eps0)
    ns = dN.max() + p["p0"] + p["n0"]

    N = dN + p["n0"]
    P = dP + p["p0"]
    E = efield_init(N, P, p["n0"], p["p0"], p["eps"], dx)
    E_int = E[1:-1]
    Ntr = 0.3 * dN if model == "traps" else None

    args = (nx, dx, p["n0"], p["p0"], p["mu_n"], p["mu_p"], p["ks"],
            p["Cn"], p["Cp"], p["Sf"], p["Sb"], p["tauN"], p["tauP"],
            lam, p["Tm"])
    if model == "std":
        y_ref = np.concatenate([N, P, E])
        dy_ref = dydt_std(0.0, y_ref, *args)
        dN_ref, dP_ref = dy_ref[:nx], dy_ref[nx:2 * nx]
        dE_ref = dy_ref[2 * nx:][1:-1]
    else:
        y_ref = np.concatenate([N, Ntr, P, E])
        dy_ref = dydt_traps(0.0, y_ref, *args, p["kC"], p["Nt"], p["tauE"])
        dN_ref, dNtr_ref = dy_ref[:nx], dy_ref[nx:2 * nx]
        dP_ref = dy_ref[2 * nx:3 * nx]
        dE_ref = dy_ref[3 * nx:][1:-1]

    sp = make_scaled_params(p, dx, ns)
    y = _scaled_state_from(dN, dP, E_int, ns, lam, dx, model, Ntr)
    dy = np.asarray((rhs_std if model == "std" else rhs_traps)(y, sp))

    e_scale = lam * dx * ns
    np.testing.assert_allclose(dy[0] * ns, dN_ref, rtol=1e-10)
    # the dD slot carries d(dP - dN)/dt; the reference difference suffers
    # f64 cancellation (R cancels numerically there, exactly here), so
    # compare against the state-space-resolved quantity with a tolerance
    # scaled to the individual rates
    if model == "std":
        scale = np.abs(dP_ref) + np.abs(dN_ref)
        np.testing.assert_allclose(dy[1] * ns, dP_ref - dN_ref,
                                   atol=1e-10 * scale.max(), rtol=1e-7)
        np.testing.assert_allclose(dy[2, :-1] * e_scale, dE_ref, rtol=1e-10)
        assert dy[2, -1] == 0.0
    else:
        np.testing.assert_allclose(dy[1] * ns, dNtr_ref, rtol=1e-10)
        scale = np.abs(dP_ref) + np.abs(dN_ref)
        np.testing.assert_allclose(dy[2] * ns, dP_ref - dN_ref,
                                   atol=1e-10 * scale.max(), rtol=1e-7)
        np.testing.assert_allclose(dy[3, :-1] * e_scale, dE_ref, rtol=1e-10)


def test_traps_reduces_to_std():
    """Null trap parameters make the traps model identical to std
    (reference test_metropolis.py traps-equals-std contract)."""
    nx = 16
    dx, x, dN, dP = _setup(nx)
    p = dict(STAUB, kC=0.0, Nt=0.0, tauE=1.0)
    ns = dN.max() + p["p0"]
    sp = make_scaled_params(p, dx, ns)
    lam = q_C / (p["eps"] * eps0)
    E_int = np.zeros(nx - 1)

    y3 = _scaled_state_from(dN, dP, E_int, ns, lam, dx, "std")
    y4 = _scaled_state_from(dN, dP, E_int, ns, lam, dx, "traps")
    d3 = np.asarray(rhs_std(y3, sp))
    d4 = np.asarray(rhs_traps(y4, sp))
    np.testing.assert_allclose(d4[0], d3[0], rtol=1e-12)   # dN'
    np.testing.assert_allclose(d4[2], d3[1], rtol=1e-12)   # dD'
    np.testing.assert_allclose(d4[3], d3[2], rtol=1e-12)   # E'
    np.testing.assert_allclose(d4[1], 0.0, atol=1e-15)     # Ntrap'


def test_equilibrium_is_steady_state():
    """Zero excess carriers -> zero dynamics (reference
    test_forward_solver.py zero-dynamics contract)."""
    nx = 16
    dx = 311.0 / nx
    p = STAUB
    ns = p["p0"]
    sp = make_scaled_params(p, dx, ns)
    y = jnp.zeros((3, nx), dtype=jnp.float64)
    dy = np.asarray(rhs_std(y, sp))
    np.testing.assert_allclose(dy, 0.0, atol=1e-18)


def test_beer_lambert_matches_oracle_and_direction():
    nx = 32
    dx = 311.0 / nx
    x = np.linspace(dx / 2, 311.0 - dx / 2, nx)
    f, a = 2.12e-3, 6e-3
    fwd = np.asarray(beer_lambert(f, a, jnp.asarray(x), direction=1))
    np.testing.assert_allclose(fwd, bl_np(f, a, x), rtol=1e-12)
    bwd = np.asarray(beer_lambert(f, a, jnp.asarray(x), direction=-1))
    np.testing.assert_allclose(bwd, fwd[::-1], rtol=1e-12)


def test_observables_match_oracle():
    nx = 24
    dx, x, dN, dP = _setup(nx)
    p = STAUB
    ns = dN.max() + p["p0"]
    sp = make_scaled_params(p, dx, ns)
    lam = q_C / (p["eps"] * eps0)
    y = _scaled_state_from(dN, dP, np.zeros(nx - 1), ns, lam, dx)

    pl_t, trts_t = observables_std(y, sp, dx)
    pl_mult, trts_mult = observable_multipliers(p, ns)

    N, P = dN + p["n0"], dP + p["p0"]
    pl_ref = calculate_pl(dx, N, P, p["ks"], p["n0"], p["p0"]) * 1e23
    trts_ref = calculate_trts(dx, N, P, p["mu_n"], p["mu_p"],
                              p["n0"], p["p0"]) * 1e9
    np.testing.assert_allclose(float(pl_t) * float(pl_mult), pl_ref, rtol=1e-10)
    np.testing.assert_allclose(float(trts_t) * float(trts_mult), trts_ref,
                               rtol=1e-10)


def test_initial_state_has_zero_field():
    init_dN = jnp.asarray(np.linspace(1e-5, 1e-7, 16))
    y = initial_state(init_dN, 1e-5, model="std")
    # dD (charge difference) and E start at exactly zero
    np.testing.assert_allclose(np.asarray(y[1]), 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(y[2]), 0.0, atol=0)
