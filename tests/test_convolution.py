"""IRF convolution tests (reference test_convolution.py contracts):
closed-form moment tables vs the reference's numerical Simpson integration,
convolution vs analytic forms, the XLA FIR path vs the loop reference, and
the full masked likelihood IRF path on the real shipped IRF files."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metrotrpl_tpu.oracle.irf_reference import (
    convolve_reference,
    do_irf_convolution_reference,
    make_tables_numeric,
    post_conv_trim_reference,
)
from metrotrpl_tpu.ops.convolve import convolve_moments, i_moment_closed, make_I_tables

IRF_520 = os.path.join(os.path.dirname(__file__), "..", "IRFs",
                       "irf_520nm.csv")


def test_closed_form_moments_match_simpson():
    """Simpson over 1000 interpolants of a linear integrand is exact, so
    the closed form agrees to roundoff (reference laplace.py:129-167)."""
    t = np.linspace(0, 10, 40)
    y = np.exp(-((t - 3) ** 2))
    closed = i_moment_closed(t, y)
    numeric = make_tables_numeric(t, y)
    np.testing.assert_allclose(closed, numeric, rtol=1e-8, atol=1e-14)


def test_convolution_exp_sin_analytic():
    """(exp(-t) * sin(t))(t) = (exp(-t) + sin t - cos t)/2
    (reference laplace.py commented self-test)."""
    t = np.linspace(0, 10, 100)
    dt = t[1] - t[0]
    tt = np.arange(0, t[-1] + dt / 4, dt / 2)
    f = np.exp(-tt)
    g = np.sin(t)
    table = i_moment_closed(t, g)
    h = convolve_reference(f, table)
    expect = 0.5 * (np.exp(-t) + np.sin(t) - np.cos(t))
    np.testing.assert_allclose(h, expect, atol=2e-3)


def test_convolution_window_triangle():
    """Box (*) box = triangle."""
    t = np.linspace(0, 10, 1000)
    dt = t[1] - t[0]
    tt = np.arange(0, t[-1] + dt / 4, dt / 2)
    f = np.where(tt < 1, 1.0, 0.0)
    g = np.where(t < 1, 1.0, 0.0)
    table = i_moment_closed(t, g)
    h = convolve_reference(f, table)
    expect = np.where(t < 1, t, np.where(t <= 2, 2 - t, 0.0))
    np.testing.assert_allclose(h, expect, atol=2e-2)


def test_xla_fir_matches_loop_reference(rng):
    """The batched XLA conv path equals the reference's k-loop."""
    nk = 200
    nk_irf = 37
    B = 3
    ys = rng.standard_normal((B, 2 * nk + 1))
    tables = rng.standard_normal((B, nk_irf, 3))
    out = np.asarray(jax.jit(convolve_moments)(
        jnp.asarray(ys), jnp.asarray(tables)))
    for b in range(B):
        expect = convolve_reference(ys[b], tables[b])
        np.testing.assert_allclose(out[b], expect, rtol=1e-8, atol=1e-10)


@pytest.mark.skipif(not os.path.exists(IRF_520), reason="IRF file missing")
def test_make_I_tables_real_irf():
    irf = np.loadtxt(IRF_520, delimiter=",")
    tables = make_I_tables({520: irf})
    table, t_irf = tables[520]
    assert table.shape == (len(irf), 3)
    numeric = make_tables_numeric(irf[:, 0], irf[:, 1])
    np.testing.assert_allclose(table, numeric, rtol=1e-7, atol=1e-12)
    # last row is zero by the reference's loop bound
    np.testing.assert_allclose(table[-1], 0.0, atol=0)


def test_make_I_tables_rejects_nonuniform_grid():
    """The moment convolution assumes a uniform IRF time grid; a
    non-uniform file must fail loudly (the reference silently produces
    mutually-misaligned taps vs resample grid, laplace.py:66/162)."""
    t = np.array([0.0, 1.0, 2.0, 4.0, 5.0])  # one doubled interval
    irf = np.stack([t, np.exp(-t)], axis=1)
    with pytest.raises(ValueError, match="not uniformly sampled"):
        make_I_tables({520: irf})


@pytest.mark.skipif(not os.path.exists(IRF_520), reason="IRF file missing")
def test_irf_likelihood_path_matches_reference_pipeline():
    """End-to-end: the masked fixed-shape IRF path inside the likelihood
    (resample -> convolve -> max-shift -> trim -> interp) reproduces the
    reference pipeline applied to the same simulated curve."""
    from metrotrpl_tpu.inference.likelihood import (
        build_likelihood_plan,
        make_eval_logll,
    )
    from metrotrpl_tpu.oracle import solve_reference
    from metrotrpl_tpu.oracle.scipy_reference import beer_lambert as bl
    from metrotrpl_tpu.solver.forward import solve_single

    UC = {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5, "mu_p": 1e5, "ks": 1e12,
          "Cn": 1e33, "Cp": 1e33, "Sf": 1e-2, "Sb": 1e-2}
    TRUE = {"n0": 1e8, "p0": 3e15, "mu_n": 20, "mu_p": 20, "ks": 4.8e-11,
            "Cn": 4.4e-29, "Cp": 4.4e-29, "Sf": 10, "Sb": 10,
            "tauN": 511, "tauP": 871, "eps": 10, "Tm": 300}
    names = list(TRUE)
    pm = {k: v * UC.get(k, 1) for k, v in TRUE.items()}
    nx, th = 24, 311.0
    dx = th / nx
    x = np.linspace(dx / 2, th - dx / 2, nx)
    t = np.linspace(0, 200, 81)
    ic = bl(2.12e11 * 1e-14, 6e4 * 1e-7, x)

    irf = np.loadtxt(IRF_520, delimiter=",")
    tables = make_I_tables({520: irf})

    # Reference-pipeline expectation, built from OUR solver curve so the
    # comparison isolates the convolution/trim path.
    sol = solve_single(ic, pm, th, nx, t)
    ct, cy, ok = do_irf_convolution_reference(
        t, sol, tables[520][0], tables[520][1], time_max_shift=True)
    assert ok
    # Use the reference-pipeline convolved curve (log10, interpolated onto
    # the experimental times) as "experimental data": the residual of the
    # matching state through OUR conv path must then be ~0 on the trimmed
    # span, isolating convolution/trim differences.

    sim_info = {"lengths": [th], "nx": [nx], "meas_types": ["TRPL"],
                "num_meas": 1}
    pi = {
        "names": names,
        "unit_conversions": UC,
        "do_log": {n: 1 for n in names},
        "active": {n: 1 for n in names},
        "init_guess": dict(TRUE),
        "prior_dist": {n: (1e-30, 1e30) for n in names},
        "trial_move": {n: 0.01 for n in names},
    }
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": 1.0, "irf_convolution": [520]}
    e_data = ([t], [np.log10(np.abs(np.interp(t, ct, cy)))],
              [np.full(len(t), 0.05)])
    plan = build_likelihood_plan(
        sim_info, pi, mcmc, e_data, np.array([[2.12e11, 6e4, 1]]),
        irf_tables=tables)
    ev = jax.jit(make_eval_logll(plan, dtype=jnp.float64))
    st = jnp.asarray([[TRUE[n] for n in names]], jnp.float64)
    ll = float(ev(st, jnp.asarray([1.0]))["logll_T"][0, 0])
    # data == reference-pipeline convolution of the same model curve, so
    # the only residual is our conv path vs the reference conv path
    assert ll > -1e-3, f"IRF path mismatch: logll {ll}"

    # and a wrong state is clearly distinguished (100x surface
    # recombination changes the early decay even over a 200 ns window)
    st2 = jnp.asarray([[TRUE[n] if n != "Sf" else 1000.0 for n in names]])
    ll2 = float(ev(st2, jnp.asarray([1.0]))["logll_T"][0, 0])
    assert ll2 < ll - 10
