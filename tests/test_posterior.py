"""Posterior-recovery integration test: MH on oracle-generated synthetic
data must concentrate around the true parameters (the BASELINE.json
posterior-agreement contract, in miniature for CPU CI)."""

import numpy as np

from metrotrpl_tpu.inference import metro
from metrotrpl_tpu.oracle import solve_reference
from metrotrpl_tpu.oracle.scipy_reference import beer_lambert as bl

UC = {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5, "mu_p": 1e5, "ks": 1e12,
      "Cn": 1e33, "Cp": 1e33, "Sf": 1e-2, "Sb": 1e-2}
TRUE = {"n0": 1e8, "p0": 3e15, "mu_n": 20, "mu_p": 20, "ks": 4.8e-11,
        "Cn": 4.4e-29, "Cp": 4.4e-29, "Sf": 10, "Sb": 10,
        "tauN": 511, "tauP": 871, "eps": 10, "Tm": 300}


def test_mh_recovers_true_params(tmp_path):
    names = list(TRUE)
    nx, th = 24, 311.0
    dx = th / nx
    x = np.linspace(dx / 2, th - dx / 2, nx)
    t = np.linspace(0, 1000, 51)
    pm = {k: v * UC.get(k, 1) for k, v in TRUE.items()}
    pl = solve_reference(bl(2.12e11 * 1e-14, 6e4 * 1e-7, x), th, nx, t, pm)
    e_data = ([t], [np.log10(pl)], [np.full(len(t), 0.02)])
    sim_info = {"lengths": [th], "nx": [nx], "meas_types": ["TRPL"],
                "num_meas": 1}
    pi = {
        "names": names,
        "unit_conversions": UC,
        "do_log": {n: 1 for n in names},
        "active": {n: (1 if n in ("p0", "tauN") else 0) for n in names},
        "init_guess": dict(TRUE, p0=1.2e15, tauN=250),  # start well off
        "prior_dist": {"n0": (0, np.inf), "p0": (1e14, 1e16),
                       "mu_n": (1, 100), "mu_p": (1, 100),
                       "ks": (1e-11, 1e-9), "Cn": (1e-29, 1e-27),
                       "Cp": (1e-29, 1e-27), "Sf": (1e-1, 1e4),
                       "Sb": (1e-1, 1e4), "tauN": (1, 2e3),
                       "tauP": (1, 1e4), "eps": (0, np.inf),
                       "Tm": (0, np.inf)},
        "trial_move": {n: 0.03 for n in names},
    }
    mcmc = {"init_cond_path": "x", "measurement_path": "x",
            "output_path": str(tmp_path / "out"), "ini_mode": "fluence",
            "num_iters": 260, "solver": ("solveivp",), "model": "std",
            "model_uncertainty": 0.03, "log_y": 1, "hard_bounds": 1,
            "checkpoint_freq": 260, "parallel_tempering": [1.0, 8.0, 64.0],
            "temper_freq": 10, "load_checkpoint": None}
    iniPar = np.array([[2.12e11, 6e4, 1]])

    ens = metro(sim_info, iniPar, e_data, mcmc, pi,
                export_path="final.pik", seed=17)
    H = ens.H
    # cold chain, post burn-in
    p0_idx, tau_idx = names.index("p0"), names.index("tauN")
    burn = 150
    p0_mean = H.states[0, p0_idx, burn:].mean()
    tau_mean = H.states[0, tau_idx, burn:].mean()
    # posterior means within ~15% of truth (loose: short chain)
    assert abs(np.log10(p0_mean / 3e15)) < np.log10(1.3), p0_mean
    assert abs(np.log10(tau_mean / 511)) < np.log10(1.3), tau_mean
    # cold-chain likelihood converged near zero residual
    assert H.loglikelihood[0, burn:].mean() > -30
