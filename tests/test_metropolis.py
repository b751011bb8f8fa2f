"""MH walk + tempering integration tests on a fast synthetic problem, and
bit-exact checkpoint/resume (reference test_checkpoint.py:160-214 contract).

Uses the 'pa' toy measurement (no PDE) so the walk itself is the thing
under test and iterations are cheap on CPU.
"""

import os

import numpy as np
import pytest

from metrotrpl_tpu.inference import metro
from metrotrpl_tpu.io.ensemble import load_checkpoint


def _pa_setup(tmp_path, num_iters=60, temps=(0.05, 0.3, 2.0), **mcmc_over):
    """pa toy problem (reference pa_toy_writer.py settings)."""
    sim_info = {"lengths": [1], "nx": [1], "meas_types": ["pa"],
                "num_meas": 1}
    pi = {
        "names": ["x0"],
        "unit_conversions": {},
        "do_log": {"x0": 0},
        "active": {"x0": 1},
        "init_guess": {"x0": 0.2},
        "prior_dist": {"x0": (-2, 2)},
        "trial_move": {"x0": 0.2},
    }
    mcmc = {"init_cond_path": "x", "measurement_path": "x",
            "output_path": str(tmp_path / "out"),
            "ini_mode": "density", "num_iters": num_iters,
            "solver": ("sdirk",), "model": "std",
            "model_uncertainty": 1, "log_y": 1, "hard_bounds": 1,
            "checkpoint_freq": num_iters,
            "parallel_tempering": list(temps), "temper_freq": 5,
            "load_checkpoint": None}
    mcmc.update(mcmc_over)
    e_data = ([np.array([0.0])], [np.array([0.0])], [np.array([1.0])])
    iniPar = np.zeros((1, 1))
    return sim_info, pi, mcmc, e_data, iniPar


def test_mh_pa_walk_statistics(tmp_path):
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(tmp_path, num_iters=300)
    ens = metro(sim_info, iniPar, e_data, mcmc, pi,
                export_path="final.pik", seed=7)
    H = ens.H
    # healthy acceptance on every chain
    acc = H.accept[:, 1:].mean(axis=1)
    assert np.all(acc > 0.05) and np.all(acc < 0.95)
    # walker stays in the prior box
    assert np.all(H.states > -2) and np.all(H.states < 2)
    # the cold chain concentrates in low-potential regions: mean U under
    # the cold chain should be below the hot chain's
    def mean_u(x):
        m = np.select([x < -1.25, x < -0.25, x < 0.75, x < 1.75],
                      [1, 2, 3, 4], 5)
        return np.mean(m * (1 + np.sin(2 * np.pi * x)))
    u_cold = mean_u(H.states[0, 0, 100:])
    u_hot = mean_u(H.states[-1, 0, 100:])
    assert u_cold < u_hot
    # tempering swaps occurred and some were accepted
    assert H.swap_attempts.sum() > 0
    assert H.swap_accept.sum() > 0
    # output written
    assert os.path.exists(str(tmp_path / "out" / "final.pik"))


def test_checkpoint_resume_bit_exact(tmp_path):
    """10 straight iterations == 5 + checkpoint + load + 5 more, bit for
    bit, including the keyed RNG stream."""
    n = 12
    # run A: straight through
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=n, checkpoint_freq=n)
    mcmc["output_path"] = str(tmp_path / "a")
    ens_a = metro(sim_info, iniPar, e_data, mcmc, pi,
                  export_path="final.pik", seed=99)

    # run B: halt at 6, resume to 12
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=6, checkpoint_freq=6)
    mcmc["output_path"] = str(tmp_path / "b")
    metro(sim_info, iniPar, e_data, mcmc, pi,
          export_path="ckpt.pik", seed=99)
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=n, checkpoint_freq=n)
    mcmc["output_path"] = str(tmp_path / "b")
    mcmc["load_checkpoint"] = "ckpt.pik"
    ens_b = metro(sim_info, iniPar, e_data, mcmc, pi,
                  export_path="final.pik", seed=99)

    np.testing.assert_array_equal(ens_a.H.states, ens_b.H.states)
    np.testing.assert_array_equal(ens_a.H.loglikelihood,
                                  ens_b.H.loglikelihood)
    np.testing.assert_array_equal(ens_a.H.accept[:, 6:],
                                  ens_b.H.accept[:, 6:])


def test_checkpoint_roundtrip_and_gui_compat(tmp_path):
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(tmp_path, num_iters=8)
    ens = metro(sim_info, iniPar, e_data, mcmc, pi,
                export_path="final.pik", seed=1)
    path = str(tmp_path / "out" / "final.pik")

    # loads through our loader
    back = load_checkpoint(path)
    np.testing.assert_array_equal(back.H.states, ens.H.states)
    assert back.latest_iter == ens.latest_iter
    assert back.ensemble_fields["names"] == ["x0"]

    # the stream must not reference this package at all — the reference
    # GUI's plain pickle.load runs in an environment without it
    with open(path, "rb") as f:
        raw = f.read()
    assert b"metrotrpl_tpu" not in raw

    # unpickles with a reference-style top-level sim_utils module
    import pickle
    import sys
    import types
    shim = types.ModuleType("sim_utils")

    class _E:
        pass

    class _H:
        pass
    shim.Ensemble = _E
    shim.History = _H
    sys.modules["sim_utils"] = shim
    try:
        with open(path, "rb") as f:
            obj = pickle.load(f)
        assert type(obj).__name__ == "_E"
        assert hasattr(obj.H, "mean_x0")
        assert obj.H.mean_x0.shape == (3, 8)
    finally:
        del sys.modules["sim_utils"]


def test_single_chain_no_tempering(tmp_path):
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=20, temps=(1.0,))
    ens = metro(sim_info, iniPar, e_data, mcmc, pi,
                export_path="final.pik", seed=3)
    assert ens.H.states.shape == (1, 1, 20)
    assert ens.H.swap_attempts.sum() == 0


def test_vmap_ensembles_matches_individual_runs(tmp_path):
    """E vmapped ensembles == E separate runs with the same keys."""
    import jax
    import jax.numpy as jnp

    from metrotrpl_tpu.inference.likelihood import build_likelihood_plan
    from metrotrpl_tpu.inference.metropolis import (
        build_mh_kernel,
        vmap_ensembles,
    )
    from metrotrpl_tpu.inference.moves import build_move_plan

    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(tmp_path)
    plan = build_likelihood_plan(
        sim_info, pi, dict(mcmc, model_uncertainty=1), e_data, iniPar)
    move_plan = build_move_plan(pi, mcmc)
    temps = np.array([0.05, 0.3, 2.0])
    kernel = build_mh_kernel(plan, move_plan, temps, np.array([0.2]),
                             temper_freq=5, do_tempering=True, window=6)
    vk = vmap_ensembles(kernel)

    E = 3
    states = jnp.asarray(
        np.linspace(-0.5, 0.5, E)[:, None, None] * np.ones((E, 3, 1)))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(E))

    ll0 = vk.init_ll(states)
    outs = vk.run_window(states, ll0, jnp.asarray(1), keys)

    for e in range(E):
        ll0_e = kernel.init_ll(states[e])
        out_e = kernel.run_window(states[e], ll0_e, jnp.asarray(1),
                                  jax.random.PRNGKey(e))
        np.testing.assert_allclose(np.asarray(outs[0][e]),
                                   np.asarray(out_e[0]), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(outs[1][e]),
                                   np.asarray(out_e[1]), rtol=1e-12)


def test_metro_n_ensembles_matches_separate_runs(tmp_path):
    """metro(n_ensembles=2) (fused run_mh_fused driver) == two separate
    metro runs with the same seeds, including History contents and
    per-replica checkpoint files."""
    n = 14
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=n, checkpoint_freq=7)
    mcmc["output_path"] = str(tmp_path / "fused")
    enss = metro(sim_info, iniPar, e_data, mcmc, pi, seed=99,
                 n_ensembles=2)
    assert len(enss) == 2
    for e in range(2):
        assert os.path.exists(
            str(tmp_path / "fused" / f"CPU{e}-final.pik"))

    for e, seed in enumerate((99, 100)):
        sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
            tmp_path, num_iters=n, checkpoint_freq=7)
        mcmc["output_path"] = str(tmp_path / f"solo{e}")
        solo = metro(sim_info, iniPar, e_data, mcmc, pi,
                     export_path="final.pik", seed=seed)
        np.testing.assert_allclose(enss[e].H.states, solo.H.states,
                                   rtol=1e-12)
        np.testing.assert_allclose(enss[e].H.loglikelihood,
                                   solo.H.loglikelihood, rtol=1e-12)
        np.testing.assert_array_equal(enss[e].H.accept, solo.H.accept)
        np.testing.assert_array_equal(enss[e].H.swap_attempts,
                                      solo.H.swap_attempts)
    # the two replicas actually diverged (different RNG streams)
    assert not np.array_equal(enss[0].H.states, enss[1].H.states)


def test_run_ensembles_sequential_matches_vmap(tmp_path):
    """The VMEM-optimal sequential multi-ensemble schedule produces exactly
    the vmapped results (same keys -> same walks)."""
    import jax
    import jax.numpy as jnp

    from metrotrpl_tpu.inference.likelihood import build_likelihood_plan
    from metrotrpl_tpu.inference.metropolis import (
        build_mh_kernel,
        run_ensembles_sequential,
        vmap_ensembles,
    )
    from metrotrpl_tpu.inference.moves import build_move_plan

    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(tmp_path)
    plan = build_likelihood_plan(
        sim_info, pi, dict(mcmc, model_uncertainty=1), e_data, iniPar)
    move_plan = build_move_plan(pi, mcmc)
    temps = np.array([0.05, 0.3, 2.0])
    kernel = build_mh_kernel(plan, move_plan, temps, np.array([0.2]),
                             temper_freq=5, do_tempering=True, window=6)
    vk = vmap_ensembles(kernel)

    E = 3
    states = jnp.asarray(
        np.linspace(-0.5, 0.5, E)[:, None, None] * np.ones((E, 3, 1)))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(E))

    ll0 = vk.init_ll(states)
    out_v = vk.run_window(states, ll0, jnp.asarray(1), keys)
    out_s = run_ensembles_sequential(kernel, states, ll0, jnp.asarray(1),
                                     keys)
    for a, b in zip(jax.tree.leaves(out_v), jax.tree.leaves(out_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_resume_rewind_resets_progress_marker(tmp_path):
    """Resuming with starting_iter < latest_iter must rewind latest_iter
    too — otherwise an interrupt before the first new window completes
    would checkpoint zeroed history rows as if they were walked."""
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=10, checkpoint_freq=10)
    mcmc["output_path"] = str(tmp_path / "c")
    metro(sim_info, iniPar, e_data, mcmc, pi,
          export_path="ckpt.pik", seed=5)

    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=14, checkpoint_freq=14)
    mcmc["output_path"] = str(tmp_path / "c")
    mcmc["load_checkpoint"] = "ckpt.pik"
    mcmc["starting_iter"] = 4
    ens = metro(sim_info, iniPar, e_data, mcmc, pi,
                export_path="final.pik", seed=5)
    # the rewound walk re-walked iterations 4..13 (none left zeroed)
    assert ens.latest_iter == 14
    assert np.all(np.isfinite(ens.H.loglikelihood))
    assert not np.all(ens.H.states[:, :, 4:] == 0)


def test_walk_invariant_to_checkpoint_partitioning(tmp_path):
    """The SAME walk regardless of how it is cut into checkpoint windows
    — including the swap counters. A partial final window scans its
    compiled length but masks the tail iterations to no-ops (mh_core
    n_valid); without the mask the phantom tail advanced the carried
    states/ll past num_iters and inflated swap_attempts differently per
    partitioning."""
    n = 10
    runs = []
    for cpf in (n, 4, 3):
        sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
            tmp_path, num_iters=n, checkpoint_freq=cpf)
        mcmc["output_path"] = str(tmp_path / f"cpf{cpf}")
        mcmc["temper_freq"] = 2
        runs.append(metro(sim_info, iniPar, e_data, mcmc, pi,
                          export_path="final.pik", seed=7))
    a = runs[0]
    # 4 valid temper rounds (k = 2,4,6,8) x (K-1 = 2) pair attempts each
    assert a.H.swap_attempts.sum() == 8
    for b in runs[1:]:
        np.testing.assert_array_equal(a.H.states, b.H.states)
        np.testing.assert_array_equal(a.H.loglikelihood, b.H.loglikelihood)
        np.testing.assert_array_equal(a.H.accept, b.H.accept)
        np.testing.assert_array_equal(a.H.swap_attempts, b.H.swap_attempts)
        np.testing.assert_array_equal(a.H.swap_accept, b.H.swap_accept)


def test_even_window_sizes():
    """Checkpoint windows split the walk near-equally (one compiled scan
    length, no discarded-tail iterations) and never exceed the requested
    checkpoint frequency."""
    from metrotrpl_tpu.inference.metropolis import _even_window

    assert _even_window(99, 1000) == 99       # single window
    assert _even_window(1000, 1000) == 1000
    assert _even_window(1499, 1000) == 750    # 2 even windows, not 1000+499
    assert _even_window(2500, 1000) == 834
    assert _even_window(1, 1000) == 1
    for total in (1, 7, 999, 1000, 1001, 12345):
        for cpf in (1, 10, 1000):
            w = _even_window(total, cpf)
            assert 1 <= w <= cpf
            n_win = -(-total // w)
            assert n_win * w - total < n_win  # waste < one iter per window


def test_resume_with_smaller_num_iters_truncates_cleanly(tmp_path):
    """Resuming a checkpoint with num_iters below the checkpoint's
    progress must truncate and no-op, not index past the truncated
    history arrays."""
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=10, checkpoint_freq=10)
    mcmc["output_path"] = str(tmp_path / "c")
    metro(sim_info, iniPar, e_data, mcmc, pi,
          export_path="ckpt.pik", seed=5)

    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=6, checkpoint_freq=6)
    mcmc["output_path"] = str(tmp_path / "c")
    mcmc["load_checkpoint"] = "ckpt.pik"
    ens = metro(sim_info, iniPar, e_data, mcmc, pi,
                export_path="final.pik", seed=5)
    assert ens.latest_iter == 6
    assert ens.H.accept.shape[1] == 6
    assert ens.H.states.shape[2] == 6
    assert np.all(np.isfinite(ens.H.loglikelihood))


def test_metro_n_ensembles_resume_bit_exact(tmp_path):
    """Fused multi-ensemble resume (VERDICT r2 missing #5): straight 12
    iters == 6 + per-replica checkpoints + resume to 12, bit for bit,
    for both replicas (load_checkpoint as a '{e}' template)."""
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=12, checkpoint_freq=6)
    mcmc["output_path"] = str(tmp_path / "a")
    enss_a = metro(sim_info, iniPar, e_data, mcmc, pi, seed=99,
                   n_ensembles=2)

    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=6, checkpoint_freq=6)
    mcmc["output_path"] = str(tmp_path / "b")
    metro(sim_info, iniPar, e_data, mcmc, pi, seed=99, n_ensembles=2)
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(
        tmp_path, num_iters=12, checkpoint_freq=6)
    mcmc["output_path"] = str(tmp_path / "b")
    mcmc["load_checkpoint"] = "CPU{e}-final.pik"
    enss_b = metro(sim_info, iniPar, e_data, mcmc, pi, n_ensembles=2)

    # the resumed run recovered each replica's stored seed
    assert [e.ensemble_fields["_rng_seed"] for e in enss_b] == [99, 100]
    for a, b in zip(enss_a, enss_b):
        np.testing.assert_array_equal(a.H.states, b.H.states)
        np.testing.assert_array_equal(a.H.loglikelihood, b.H.loglikelihood)
        np.testing.assert_array_equal(a.H.accept[:, 6:], b.H.accept[:, 6:])


def test_multi_ensemble_resume_needs_per_replica_paths(tmp_path):
    """A plain (non-template) checkpoint name cannot resume n_ensembles>1
    — every replica would load the same file."""
    sim_info, pi, mcmc, e_data, iniPar = _pa_setup(tmp_path, num_iters=6)
    mcmc["load_checkpoint"] = "CPU0-final.pik"
    with pytest.raises(ValueError, match="per-replica"):
        metro(sim_info, iniPar, e_data, mcmc, pi, n_ensembles=2)
