"""Config script + data IO tests.

Mirrors the contracts of the reference suites test_bayes_io.py,
test_io_remapping.py, and test_MCMC_script_gen.py (see SURVEY.md section 4).
"""

import os

import numpy as np
import pytest

from metrotrpl_tpu.config import (
    generate_config_script_file,
    get_data,
    get_initpoints,
    insert_param,
    read_config_script_file,
    remap_constraint_grps,
    remap_fittable_inds,
)


def _example_config():
    simPar = {
        "lengths": [311, 2000, 311],
        "nx": [128, 128, 128],
        "meas_types": ["TRPL", "TRPL", "TRTS"],
        "num_meas": 3,
    }
    names = ["n0", "p0", "mu_n", "mu_p", "ks", "Cn", "Cp", "Sf", "Sb",
             "tauN", "tauP", "eps", "Tm"]
    param_info = {
        "names": list(names),
        "unit_conversions": {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5,
                             "mu_p": 1e5, "ks": 1e12, "Cn": 1e33, "Cp": 1e33,
                             "Sf": 1e-2, "Sb": 1e-2},
        "do_log": {n: 1 for n in names},
        "active": {n: (0 if n in ("n0", "eps", "Tm") else 1) for n in names},
        "init_guess": {"n0": 1e8, "p0": 3e15, "mu_n": 20, "mu_p": 20,
                       "ks": 4.8e-11, "Cn": 4.4e-29, "Cp": 4.4e-29,
                       "Sf": 10, "Sb": 10, "tauN": 511, "tauP": 871,
                       "eps": 10, "Tm": 300},
        "prior_dist": {"n0": (0, np.inf), "p0": (1e14, 1e16),
                       "mu_n": (1e0, 1e2), "mu_p": (1e0, 1e2),
                       "ks": (1e-11, 1e-9), "Cn": (1e-29, 1e-27),
                       "Cp": (1e-29, 1e-27), "Sf": (1e-1, 1e4),
                       "Sb": (1e-1, 1e4), "tauN": (1, 2e3),
                       "tauP": (1, 1e4), "eps": (0, np.inf),
                       "Tm": (0, np.inf)},
        "trial_move": {n: 0.01 for n in names},
    }
    meas_flags = {"time_cutoff": [0, 2000], "select_obs_sets": None}
    MCMC_fields = {
        "init_cond_path": os.path.join("Inputs", "ic.csv"),
        "measurement_path": os.path.join("Inputs", "data.csv"),
        "output_path": os.path.join("outputs", "run0"),
        "num_iters": 100,
        "solver": ("solveivp",),
        "model": "std",
        "ini_mode": "fluence",
        "model_uncertainty": 1,
        "log_y": 1,
        "irf_convolution": None,
        "parallel_tempering": [1.0, 2.0, 8.0],
        "temper_freq": 10,
        "hard_bounds": 1,
        "force_min_y": 0,
        "checkpoint_freq": 50,
        "load_checkpoint": None,
        "scale_factor": None,
    }
    return simPar, param_info, meas_flags, MCMC_fields


def test_config_roundtrip(tmp_path):
    simPar, param_info, meas_flags, MCMC_fields = _example_config()
    path = str(tmp_path / "config0.txt")
    generate_config_script_file(path, simPar, param_info, meas_flags,
                                MCMC_fields, verbose=True)

    grid2, pi2, mf2, mc2 = read_config_script_file(path)
    assert grid2["num_meas"] == 3
    assert list(grid2["lengths"]) == [311, 2000, 311]
    assert grid2["meas_types"] == ["TRPL", "TRPL", "TRTS"]
    assert pi2["names"] == param_info["names"]
    for n in param_info["names"]:
        assert pi2["do_log"][n] == param_info["do_log"][n]
        assert pi2["active"][n] == param_info["active"][n]
        assert pi2["init_guess"][n] == pytest.approx(param_info["init_guess"][n])
        assert pi2["trial_move"][n] == pytest.approx(param_info["trial_move"][n])
        assert pi2["prior_dist"][n][0] == pytest.approx(param_info["prior_dist"][n][0])
        assert pi2["prior_dist"][n][1] == pytest.approx(param_info["prior_dist"][n][1])
    assert list(mf2["time_cutoff"]) == [0, 2000]
    assert list(mf2["select_obs_sets"]) == [0, 1, 2]
    assert mc2["num_iters"] == 100
    assert mc2["solver"] == ("solveivp",)
    assert mc2["model"] == "std"
    assert mc2["ini_mode"] == "fluence"
    assert mc2["log_y"] == 1
    assert mc2["model_uncertainty"] == {"TRPL": 1.0, "TRTS": 1.0}
    assert mc2["irf_convolution"] is None
    assert list(mc2["parallel_tempering"]) == [1.0, 2.0, 8.0]
    assert mc2["temper_freq"] == 10
    assert mc2["hard_bounds"] == 1
    assert mc2["checkpoint_freq"] == 50
    assert mc2["load_checkpoint"] is None
    assert mc2["scale_factor"] is None


def test_config_roundtrip_with_fittables_and_select(tmp_path):
    simPar, param_info, meas_flags, MCMC_fields = _example_config()
    meas_flags["select_obs_sets"] = [0, 2]
    MCMC_fields["scale_factor"] = [0.1, [0, 1, 2], [(0, 2)], [1.0, 1.0, 1.0]]
    MCMC_fields["irf_convolution"] = [520, 0, 745]
    path = str(tmp_path / "config1.txt")
    generate_config_script_file(path, simPar, param_info, meas_flags,
                                MCMC_fields)
    grid2, pi2, mf2, mc2 = read_config_script_file(path)

    # select [0, 2] keeps measurements 0 and 2 -> remapped as 0 and 1
    assert grid2["num_meas"] == 2
    assert grid2["meas_types"] == ["TRPL", "TRTS"]
    assert list(grid2["lengths"]) == [311, 311]
    assert mc2["irf_convolution"] == [520, 745]
    # scale factor inds remapped to [0, 1], group (0, 2) -> (0, 1)
    sf = mc2["scale_factor"]
    assert list(sf[1]) == [0, 1]
    assert sf[2] == [(0, 1)]
    # one synthetic _s0 param created (group shares it)
    assert "_s0" in pi2["names"]
    assert "_s1" not in pi2["names"]
    assert pi2["active"]["_s0"] == 1
    assert pi2["do_log"]["_s0"] == 1
    assert pi2["trial_move"]["_s0"] == pytest.approx(0.1)


def test_config_write_read_write_read_idempotent(tmp_path):
    """write -> read -> write -> read must be a fixed point, including
    fittable specs whose inds become numpy arrays after the first read
    (VERDICT r1 weak #6: str(ndarray) space-separates and is unreadable)."""
    simPar, param_info, meas_flags, MCMC_fields = _example_config()
    MCMC_fields["scale_factor"] = [0.1, [0, 1, 2], [(0, 2)], [1.0, 1.0, 1.0]]
    p1 = str(tmp_path / "c1.txt")
    generate_config_script_file(p1, simPar, param_info, meas_flags,
                                MCMC_fields)
    gridA, piA, mfA, mcA = read_config_script_file(p1)

    p2 = str(tmp_path / "c2.txt")
    generate_config_script_file(p2, gridA, piA, mfA, mcA)
    gridB, piB, mfB, mcB = read_config_script_file(p2)

    assert piB["names"] == piA["names"]  # no double _s insertion
    sfA, sfB = mcA["scale_factor"], mcB["scale_factor"]
    assert sfB[0] == pytest.approx(sfA[0])
    assert list(sfB[1]) == list(sfA[1])
    assert [tuple(g) for g in sfB[2]] == [tuple(g) for g in sfA[2]]
    assert list(sfB[3]) == pytest.approx(list(sfA[3]))
    for n in piA["names"]:
        assert piB["init_guess"][n] == pytest.approx(piA["init_guess"][n])
        assert piB["prior_dist"][n][0] == pytest.approx(piA["prior_dist"][n][0])
        assert piB["prior_dist"][n][1] == pytest.approx(piA["prior_dist"][n][1])
    assert list(mfB["select_obs_sets"]) == list(mfA["select_obs_sets"])
    assert gridB["meas_types"] == gridA["meas_types"]


def test_reject_non_config_file(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("this is not a config\n")
    with pytest.raises(OSError):
        read_config_script_file(str(bad))


def test_remap_fittable_inds():
    out = remap_fittable_inds([0, 1, 3, 4], np.array([0, 2, 4]))
    assert list(out) == [0, 2]


def test_remap_constraint_grps():
    out = remap_constraint_grps([(0, 1, 2), (3, 4, 5)], np.array([0, 2, 4]))
    assert out == [(0, 1)]


def test_insert_param_with_constraint_groups():
    param_info = {
        "names": ["a"],
        "do_log": {"a": 1},
        "prior_dist": {"a": (0, 1)},
        "init_guess": {"a": 0.5},
        "trial_move": {"a": 0.1},
        "active": {"a": 1},
    }
    MCMC_fields = {"fittable_fluences": [0.02, [0, 1, 2], [(1, 2)], [2.0, 3.0, 4.0]]}
    insert_param(param_info, MCMC_fields, mode="fluences")
    # 0 gets its own _f0; group (1, 2) shares _f1; _f2 is a dependent
    assert param_info["names"] == ["a", "_f0", "_f1"]
    assert param_info["init_guess"]["_f0"] == 2.0
    assert param_info["init_guess"]["_f1"] == 3.0
    assert param_info["trial_move"]["_f1"] == 0.02


def test_get_data_multi_measurement_split(tmp_path):
    rows = []
    # two measurements delimited by t == 0
    t1 = [0, 1, 2, 3]
    y1 = [100, 50, 25, 12.5]
    t2 = [0, 1, 2]
    y2 = [10, 5, 2.5]
    for t, y in zip(t1 + t2, y1 + y2):
        rows.append(f"{t},{y},{0.1 * y}")
    path = tmp_path / "d.csv"
    path.write_text("\n".join(rows) + "\n")

    times, vals, uncs = get_data(
        str(path), {"time_cutoff": None, "select_obs_sets": None}, {"log_y": 0}
    )
    assert len(times) == 2
    np.testing.assert_allclose(times[0], t1)
    np.testing.assert_allclose(vals[1], y2)
    np.testing.assert_allclose(uncs[0], 0.1 * np.array(y1))


def test_get_data_log_transform_and_cutoff(tmp_path):
    t = [0, 1, 2, 3, 4]
    y = [100.0, 50, 25, 12.5, 6.25]
    u = [1.0] * 5
    path = tmp_path / "d.csv"
    path.write_text("\n".join(f"{a},{b},{c}" for a, b, c in zip(t, y, u)) + "\n")

    times, vals, uncs = get_data(
        str(path), {"time_cutoff": [0, 2], "select_obs_sets": None}, {"log_y": 1}
    )
    assert len(times) == 1
    np.testing.assert_allclose(times[0], [0, 1, 2])
    np.testing.assert_allclose(vals[0], np.log10([100, 50, 25]))
    np.testing.assert_allclose(uncs[0], 1.0 / np.array([100, 50, 25]) / np.log(10))


def test_get_data_select(tmp_path):
    rows = "0,1,0.1\n1,2,0.1\n0,3,0.1\n1,4,0.1\n0,5,0.1\n1,6,0.1\n"
    path = tmp_path / "d.csv"
    path.write_text(rows)
    times, vals, _ = get_data(
        str(path), {"time_cutoff": None, "select_obs_sets": [0, 2]}, {"log_y": 0}
    )
    assert len(times) == 2
    np.testing.assert_allclose(vals[0], [1, 2])
    np.testing.assert_allclose(vals[1], [5, 6])


def test_get_initpoints(tmp_path):
    path = tmp_path / "ic.csv"
    path.write_text("1e12,6e4,1\n2e12,6e4,1\n3e12,6e4,1\n")
    pts = get_initpoints(str(path), {"select_obs_sets": None})
    assert pts.shape == (3, 3)
    pts_sel = get_initpoints(str(path), {"select_obs_sets": [2]})
    np.testing.assert_allclose(pts_sel, [[3e12, 6e4, 1]])


def test_get_data_select_order_matches_initpoints(tmp_path):
    """Unsorted select_obs_sets must reorder data the same way
    get_initpoints and the grid subsetting do (the reference filters data
    in FILE order while fancy-indexing initpoints — silently mispairing
    measurements with grids for unsorted selects)."""
    rows = "0,1,0.1\n1,2,0.1\n0,3,0.1\n1,4,0.1\n0,5,0.1\n1,6,0.1\n"
    path = tmp_path / "d.csv"
    path.write_text(rows)
    flags = {"time_cutoff": None, "select_obs_sets": [2, 0]}
    times, vals, _ = get_data(str(path), flags, {"log_y": 0})
    np.testing.assert_allclose(vals[0], [5, 6])   # measurement 2 first
    np.testing.assert_allclose(vals[1], [1, 2])
    ic = tmp_path / "ic.csv"
    ic.write_text("1e12,6e4,1\n2e12,6e4,1\n3e12,6e4,1\n")
    pts = get_initpoints(str(ic), flags)
    np.testing.assert_allclose(pts[:, 0], [3e12, 1e12])  # same order

    with pytest.raises(ValueError, match="out of range"):
        get_data(str(path), {"time_cutoff": None,
                             "select_obs_sets": [7]}, {"log_y": 0})


def test_get_data_no_time_zero_rows_fails_loudly(tmp_path):
    path = tmp_path / "d.csv"
    path.write_text("0.5,1,0.1\n1,2,0.1\n")
    with pytest.raises(ValueError, match="time == 0"):
        get_data(str(path), {"time_cutoff": None,
                             "select_obs_sets": None}, {"log_y": 0})


def test_fittable_omitted_guesses_default_per_measurement(tmp_path):
    """'Fittable fluences: 0.1 [inds] None' (no guesses) must default to
    one guess PER MEASUREMENT — the reference defaults to [1]*len(inds)
    and then indexes by measurement id, an IndexError whenever
    len(inds) < num_meas (bayes_io.py:403/428/454 vs :523)."""
    sim_info, pi, meas, mcmc = _example_config()
    sim_info = dict(sim_info)
    mcmc = dict(mcmc)
    mcmc["fittable_fluences"] = [0.1, [1, 2], None, None]
    p = str(tmp_path / "cfg.txt")
    generate_config_script_file(p, sim_info, {k: (dict(v) if
                                isinstance(v, dict) else v) for k, v in
                                pi.items()}, dict(meas), mcmc)
    grid, pi2, meas2, mcmc2 = read_config_script_file(p)
    ff = mcmc2["fittable_fluences"]
    assert list(ff[3]) == [1] * grid["num_meas"]
    assert any(n.startswith("_f") for n in pi2["names"])


def test_solver_refactor_every_roundtrip_and_validation(tmp_path):
    """`Solver refactor_every` (chord-mode Newton refactor period) writes,
    reads back as int, and rejects non-positive values."""
    simPar, param_info, meas_flags, MCMC_fields = _example_config()
    MCMC_fields["solver"] = ("sdirk",)
    MCMC_fields["hmax"] = 48.0
    MCMC_fields["refactor_every"] = 4
    path = str(tmp_path / "config_chord.txt")
    generate_config_script_file(path, simPar, param_info, meas_flags,
                                MCMC_fields)
    _, _, _, mc2 = read_config_script_file(path)
    assert mc2["refactor_every"] == 4
    assert mc2["hmax"] == pytest.approx(48.0)

    from metrotrpl_tpu.config.validate import validate_MCMC_fields
    bad = dict(mc2)
    bad["refactor_every"] = 0
    with pytest.raises(ValueError, match="refactor_every"):
        validate_MCMC_fields(bad, 3)


def test_solver_newton_plateau_roundtrip_and_validation(tmp_path):
    """`Solver newton_plateau` (plateau-phase Newton count) writes, reads
    back as int, and rejects non-positive values."""
    simPar, param_info, meas_flags, MCMC_fields = _example_config()
    MCMC_fields["solver"] = ("sdirk",)
    MCMC_fields["hmax"] = 48.0
    MCMC_fields["refactor_every"] = 4
    MCMC_fields["newton_plateau"] = 1
    path = str(tmp_path / "config_np.txt")
    generate_config_script_file(path, simPar, param_info, meas_flags,
                                MCMC_fields)
    _, _, _, mc2 = read_config_script_file(path)
    assert mc2["newton_plateau"] == 1

    from metrotrpl_tpu.config.validate import validate_MCMC_fields
    bad = dict(mc2)
    bad["newton_plateau"] = 0
    with pytest.raises(ValueError, match="newton_plateau"):
        validate_MCMC_fields(bad, 3)
