"""Multi-device sharding tests on the 8-virtual-device CPU mesh."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from metrotrpl_tpu.parallel.mesh import make_chain_mesh, shard_states_fn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_eval_matches_unsharded():
    """Sharding constraints must not change results beyond reduction
    reassociation roundoff (~1e-15 relative in f64 — XLA reorders the
    per-device partial sums)."""
    import __graft_entry__
    from metrotrpl_tpu.inference.metropolis import build_mh_kernel

    n_chains = 8
    plan, move_plan, states, base_move = __graft_entry__._staub_setup(
        nx=16, nt=8, n_chains=n_chains, n_meas=2, t_end=20.0)
    states = states.astype(jnp.float64)
    temps = 2.0 ** np.arange(n_chains)

    k_plain = build_mh_kernel(
        plan, move_plan, temps, base_move, temper_freq=2, do_tempering=True,
        window=3, dtype=jnp.float64)
    mesh = make_chain_mesh(8, axis_names=("chains",))
    k_shard = build_mh_kernel(
        plan, move_plan, temps, base_move, temper_freq=2, do_tempering=True,
        window=3, dtype=jnp.float64, shard_batch=shard_states_fn(mesh))

    key = jax.random.PRNGKey(0)
    ll0 = k_plain.init_ll(states)
    out_a = k_plain.run_window(states, ll0, jnp.asarray(1), key)
    with mesh:
        ll0s = k_shard.init_ll(states)
        out_b = k_shard.run_window(states, ll0s, jnp.asarray(1), key)

    np.testing.assert_allclose(np.asarray(ll0), np.asarray(ll0s),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out_a[1]), np.asarray(out_b[1]),
                               rtol=1e-6, atol=1e-9)


def test_mesh_construction():
    mesh = make_chain_mesh(8, axis_names=("chains",))
    assert mesh.devices.shape == (8,)
    mesh2 = make_chain_mesh(8, axis_names=("chains", "sims"), shape=(4, 2))
    assert mesh2.devices.shape == (4, 2)
    assert mesh2.axis_names == ("chains", "sims")
