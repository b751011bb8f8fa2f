"""Device-mesh construction and sharding helpers."""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_chain_mesh(n_devices=None, axis_names=("chains",), shape=None):
    """Build a mesh over the available devices.

    axis_names : 1 or 2 axis names, e.g. ("chains",) or ("chains", "sims").
    shape : explicit mesh shape; defaults to all devices on the first axis.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def make_sim_sharding(mesh):
    """Sharding for the flattened (chains*measurements) simulation batch:
    the batch axis is split over ALL mesh axes (chain-major ordering keeps
    each chain's measurements on one device when the mesh is 1D)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def shard_states_fn(mesh):
    """Returns a callable placing the (chains, params) state matrix with
    chains split over the mesh's first axis — the hook the MH kernel
    applies before each batched evaluation (XLA propagates the sharding
    through the repeat/tile into the big solver batch and inserts the
    all-gather needed by the replicated swap logic)."""
    sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))

    def shard(states):
        return jax.lax.with_sharding_constraint(states, sharding)

    return shard
