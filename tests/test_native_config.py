"""Native TOML config format: equivalence with the reference text format.

Both formats must produce identical parsed dicts through the shared
finalize pipeline (validation, select_obs_sets remapping, synthetic
``_s*`` param insertion, measurement subsetting).
"""

import os

import numpy as np

from metrotrpl_tpu.cli import main as cli_main
from metrotrpl_tpu.config import (
    generate_config_script_file,
    read_config,
    read_config_script_file,
    read_config_toml,
    write_config_toml,
)


def _cfg_dicts(tmp_path, select=None, scale_factor=None):
    names = ["n0", "p0", "tauN"]
    sim_info = {"lengths": [311.0, 2000.0, 311.0], "nx": [128, 128, 128],
                "meas_types": ["TRPL", "TRPL", "TRTS"], "num_meas": 3}
    param_info = {
        "names": names,
        "unit_conversions": {"n0": 1e-21, "p0": 1e-21},
        "do_log": {n: 1 for n in names},
        "active": {"n0": 0, "p0": 1, "tauN": 1},
        "init_guess": {"n0": 1e8, "p0": 3e15, "tauN": 511.0},
        "prior_dist": {"n0": (0, np.inf), "p0": (1e14, 1e16),
                       "tauN": (1.0, 2e3)},
        "trial_move": {"n0": 0.0, "p0": 0.01, "tauN": 0.02},
    }
    meas = {"time_cutoff": [0.0, 2000.0], "select_obs_sets": select}
    mcmc = {
        "init_cond_path": str(tmp_path / "ic.csv"),
        "measurement_path": str(tmp_path / "data.csv"),
        "output_path": str(tmp_path / "out"),
        "num_iters": 100, "solver": ("sdirk",), "hmax": 48.0,
        "model": "std", "ini_mode": "fluence",
        "model_uncertainty": {"TRPL": 1.0, "TRTS": 0.1},
        "log_y": 1, "hard_bounds": 1, "checkpoint_freq": 100,
        "parallel_tempering": [1.0, 4.0], "temper_freq": 10,
    }
    if scale_factor is not None:
        mcmc["scale_factor"] = scale_factor
    return sim_info, param_info, meas, mcmc


def _assert_equiv(a, b):
    for da, db in zip(a, b):
        assert set(da) == set(db), (set(da) ^ set(db))
        for k in da:
            va, vb = da[k], db[k]
            if isinstance(va, dict):
                assert set(va) == set(vb)
                for kk in va:
                    np.testing.assert_allclose(
                        np.asarray(va[kk], dtype=float),
                        np.asarray(vb[kk], dtype=float), rtol=0,
                        err_msg=f"{k}[{kk}]")
            elif isinstance(va, str) or va is None:
                assert va == vb, k
            elif k in ("names", "meas_types", "solver"):
                assert list(va) == list(vb), k
            elif k in ("scale_factor", "fittable_fluences",
                       "fittable_absps"):
                assert (va is None) == (vb is None), k
                if va is not None:
                    assert float(va[0]) == float(vb[0])
                    np.testing.assert_array_equal(va[1], vb[1])
                    assert (va[2] is None) == (vb[2] is None)
                    if va[2] is not None:
                        assert [tuple(g) for g in va[2]] == \
                            [tuple(g) for g in vb[2]]
                    np.testing.assert_allclose(
                        np.asarray(va[3], float), np.asarray(vb[3], float))
            else:
                np.testing.assert_allclose(
                    np.asarray(va, dtype=float),
                    np.asarray(vb, dtype=float), rtol=0, err_msg=k)


def test_toml_text_equivalence_basic(tmp_path):
    sim_info, pi, meas, mcmc = _cfg_dicts(tmp_path)
    txt = str(tmp_path / "cfg.txt")
    generate_config_script_file(txt, dict(sim_info), {k: (dict(v) if
                                isinstance(v, dict) else v) for k, v in
                                pi.items()}, dict(meas), dict(mcmc))
    a = read_config_script_file(txt)

    toml = str(tmp_path / "cfg.toml")
    sim2, pi2, meas2, mcmc2 = _cfg_dicts(tmp_path)
    write_config_toml(toml, sim2, pi2, meas2, mcmc2)
    b = read_config_toml(toml)
    _assert_equiv(a, b)
    # extension dispatch
    c = read_config(toml)
    _assert_equiv(b, c)


def test_toml_text_equivalence_select_and_scale(tmp_path):
    """The gnarly path: select_obs_sets subsetting + scale-factor
    synthetic-param insertion must match across formats."""
    sim_info, pi, meas, mcmc = _cfg_dicts(tmp_path, select=[0, 2],
                                          scale_factor=[0.1, [0, 1, 2],
                                                        [(0, 2)],
                                                        [1.0, 2.0, 3.0]])
    txt = str(tmp_path / "cfg.txt")
    generate_config_script_file(txt, dict(sim_info), {k: (dict(v) if
                                isinstance(v, dict) else v) for k, v in
                                pi.items()}, dict(meas), dict(mcmc))
    a = read_config_script_file(txt)

    toml = str(tmp_path / "cfg.toml")
    sim2, pi2, meas2, mcmc2 = _cfg_dicts(tmp_path, select=[0, 2])
    mcmc2["scale_factor"] = {"trial_move": 0.1, "inds": [0, 1, 2],
                             "groups": [[0, 2]],
                             "guesses": [1.0, 2.0, 3.0]}
    write_raw_toml(toml, sim2, pi2, meas2, mcmc2)
    b = read_config_toml(toml)
    _assert_equiv(a, b)
    # synthetic params present and subsetted identically
    assert any(n.startswith("_s") for n in b[1]["names"])


def write_raw_toml(path, sim, pi, meas, mcmc):
    """Write TOML with the fittable spec already in table form (as a user
    would author it), bypassing write_config_toml's list-form conversion."""
    from metrotrpl_tpu.config.native import _toml_value
    sf = mcmc.pop("scale_factor", None)
    write_config_toml(path, sim, pi, meas, mcmc)
    if sf is not None:
        with open(path, "a") as f:
            f.write(f"scale_factor = {_toml_value(sf)}\n")


def test_convert_config_cli_roundtrip(tmp_path):
    """cli convert-config: txt -> toml -> txt preserves the parse."""
    sim_info, pi, meas, mcmc = _cfg_dicts(tmp_path)
    txt = str(tmp_path / "cfg.txt")
    generate_config_script_file(txt, dict(sim_info), {k: (dict(v) if
                                isinstance(v, dict) else v) for k, v in
                                pi.items()}, dict(meas), dict(mcmc))
    a = read_config_script_file(txt)
    toml = str(tmp_path / "cfg.toml")
    cli_main(["convert-config", txt, toml])
    assert os.path.exists(toml)
    b = read_config_toml(toml)
    _assert_equiv(a, b)
    txt2 = str(tmp_path / "cfg2.txt")
    cli_main(["convert-config", toml, txt2])
    c = read_config_script_file(txt2)
    _assert_equiv(a, c)


def test_convert_config_preserves_select_obs_sets(tmp_path):
    """convert-config must write the PRE-finalize config: a select subset
    must not be baked into the written grid (the file still references the
    full measurement CSVs), and the re-read must subset identically —
    including nx, which the reference reader forgets to subset."""
    sim_info, pi, meas, mcmc = _cfg_dicts(tmp_path, select=[0, 2])
    sim_info["nx"] = [128, 64, 32]
    txt = str(tmp_path / "cfg.txt")
    generate_config_script_file(txt, dict(sim_info), {k: (dict(v) if
                                isinstance(v, dict) else v) for k, v in
                                pi.items()}, dict(meas), dict(mcmc))
    a = read_config_script_file(txt)
    assert list(a[0]["nx"]) == [128, 32]          # subset pairs with meas
    assert list(a[0]["lengths"]) == [311.0, 311.0]

    toml = str(tmp_path / "cfg.toml")
    cli_main(["convert-config", txt, toml])
    b = read_config_toml(toml)
    _assert_equiv(a, b)
    # and back to text
    txt2 = str(tmp_path / "cfg2.txt")
    cli_main(["convert-config", toml, txt2])
    c = read_config_script_file(txt2)
    _assert_equiv(a, c)


def test_mu_constraint_toml_roundtrip(tmp_path):
    """mu_constraint is a top-level TOML key and must survive write->read
    (it must be emitted before the first [table])."""
    sim_info, pi, meas, mcmc = _cfg_dicts(tmp_path)
    pi["do_mu_constraint"] = [20.0, 3.0]
    toml = str(tmp_path / "cfg.toml")
    write_config_toml(toml, sim_info, pi, meas, mcmc)
    b = read_config_toml(toml)
    assert list(b[1]["do_mu_constraint"]) == [20.0, 3.0]
