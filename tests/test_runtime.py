"""Native runtime tests: the C++ CSV parser vs np.loadtxt on real files."""

import os
import time

import numpy as np
import pytest

from metrotrpl_tpu.runtime import load_csv, native_available

RENOISED = os.path.join(os.path.dirname(__file__), "..", "Inputs",
                        "real_staub_aug_corr_renoised.csv")


def test_native_build():
    assert native_available(), "g++ build of fastcsv failed"


def test_load_csv_matches_loadtxt(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((137, 3)) * 10.0 ** rng.integers(-20, 20,
                                                               (137, 3))
    path = str(tmp_path / "x.csv")
    np.savetxt(path, arr, delimiter=",")
    out = load_csv(path)
    ref = np.loadtxt(path, delimiter=",")
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_load_csv_single_row_and_column(tmp_path):
    p1 = str(tmp_path / "row.csv")
    open(p1, "w").write("1.5,2.5,3.5\n")
    np.testing.assert_allclose(load_csv(p1), np.loadtxt(p1, delimiter=","))
    p2 = str(tmp_path / "col.csv")
    open(p2, "w").write("1.0\n2.0\n3.0\n")
    np.testing.assert_allclose(load_csv(p2), np.loadtxt(p2, delimiter=","))


def test_load_csv_scientific_and_blank_lines(tmp_path):
    p = str(tmp_path / "s.csv")
    open(p, "w").write("0,6.828546E+16,2.054048E+15\n\n"
                       "1.13525404,6.703035E+16,2.016497E+15\n")
    out = load_csv(p)
    assert out.shape == (2, 3)
    assert out[0, 1] == 6.828546e16


def test_real_measurement_file_parity_and_speed():
    ref = np.loadtxt(RENOISED, delimiter=",")
    out = load_csv(RENOISED)
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)
    assert out.shape == ref.shape and out.ndim == 2
    # parity requirement: within 5x of numpy's C tokenizer (numpy >= 2.0);
    # the native parser exists as a portable scaffold, not a speed claim
    load_csv(RENOISED)
    t0 = time.perf_counter()
    for _ in range(5):
        load_csv(RENOISED)
    native_t = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        np.loadtxt(RENOISED, delimiter=",")
    loadtxt_t = (time.perf_counter() - t0) / 5
    assert native_t < 5 * loadtxt_t
