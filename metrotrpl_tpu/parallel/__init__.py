"""Multi-chip parallelism: chain/simulation sharding over a device mesh.

The reference's distributed model is one MPI rank per tempered chain with
send/recv swap negotiation (reference metropolis.py:400-453, 204-261). The
TPU-native equivalent: chains (and the measurement batch under them) are a
sharded array axis on a ``jax.sharding.Mesh``; XLA inserts the collectives.
Swap rounds operate on the tiny replicated (chains x temps) likelihood
matrix, so no explicit point-to-point communication exists at all.
"""

from metrotrpl_tpu.parallel.mesh import (  # noqa: F401
    make_chain_mesh,
    make_sim_sharding,
    shard_states_fn,
)
