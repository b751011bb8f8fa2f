"""End-to-end smoke test on the REAL measured staub dataset (VERDICT r2
weak #6): the vendored `Inputs/real_staub_aug_corr_renoised.csv` (3
excitation powers, 311 nm, absolute units) must load through the standard
config workflow (`cli write-real-example`), fit through metro(), and
produce a GUI-loadable posterior. The full documented fit lives in
docs/REAL_DATA.md; this test runs a short walk on the same pipeline.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def real_config(tmp_path, monkeypatch):
    from metrotrpl_tpu import cli

    monkeypatch.chdir(REPO)  # Inputs/ paths in the config are repo-relative
    out = str(tmp_path / "real_staub_mcmc.txt")
    cli.main(["write-real-example", out, "--fast", "--num-iters", "4",
              "--output", str(tmp_path / "out")])
    return out


def test_real_staub_fit_smoke(real_config, tmp_path):
    from metrotrpl_tpu.config import get_data, get_initpoints, read_config
    from metrotrpl_tpu.inference import metro
    from metrotrpl_tpu.io.ensemble import load_checkpoint

    sim_info, param_info, meas_flags, MCMC_fields = read_config(real_config)
    assert sim_info["num_meas"] == 3
    assert sim_info["lengths"] == [311] * 3
    iniPar = get_initpoints(MCMC_fields["init_cond_path"], meas_flags)
    assert iniPar.shape == (3, 128)  # density-mode profiles
    e_data = get_data(MCMC_fields["measurement_path"], meas_flags,
                      MCMC_fields)
    assert len(e_data[0]) == 3 and len(e_data[0][0]) == 141
    assert e_data[0][0][-1] > 4000  # full 4248 ns span

    # short walk: 2 tempered chains to keep the CPU cost down
    MCMC_fields["parallel_tempering"] = [1.0, 8.0]
    ens = metro(sim_info, iniPar, e_data, MCMC_fields, param_info,
                export_path="final.pik", trap_signals=False, seed=3)

    ll = ens.H.loglikelihood
    assert ll.shape == (2, 4)
    assert np.all(np.isfinite(ll))
    # the absolute-units data is in the model's PL range: a sane logll,
    # not a wild mismatch (|ll| blows up if units are misinterpreted)
    assert ll[0, 0] > -1e7

    # GUI-loadable posterior
    back = load_checkpoint(str(tmp_path / "out" / "final.pik"))
    assert hasattr(back.H, "mean_ks")
    assert back.H.mean_ks.shape == (2, 4)
