"""TPU probe: sharded-driver overhead at mesh_shape=(1,1) (VERDICT r3
missing #3 / next #6).

Real multi-chip hardware is unavailable here (one chip), so the closest
measurable datum for docs/SCALING.md is the shard_map kernel's overhead
vs the plain kernel ON THE SAME single chip: build the bench staub
workload (6 curves, nx=128, 8 tempered chains, fast h48/F4), run the
same windows through build_mh_kernel and through build_sharded_mh_kernel
on a 1x1 Mesh, and report walker-steps/s for both. If the sharded path
costs ~0%, the scaling projections reduce to collective costs (tiny:
the swap all_gather moves (K,K)+(K,P) f32 per ensemble per temper_freq).

Usage: python scripts/probe_r10_shard1x1.py [window] [n_rep]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from metrotrpl_tpu.inference.likelihood import build_likelihood_plan
from metrotrpl_tpu.inference.metropolis import build_mh_kernel
from metrotrpl_tpu.inference.moves import build_move_plan
from metrotrpl_tpu.parallel.sharded_mh import build_sharded_mh_kernel
from metrotrpl_tpu.workloads import (
    STAUB_NAMES as NAMES,
    STAUB_TRUE as TRUE,
    staub_param_info,
)
from scripts.probe_r4_window import synth_curves

N_CHAINS = 8
NT = 501
T_END = 2000.0


def main():
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    lengths = [311.0, 2000.0] * 3
    flu = np.loadtxt(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "Inputs", "staub_MAPI_threepower_twothick_fluences.csv"),
        delimiter=",")
    t = np.linspace(0, T_END, NT)
    vals = synth_curves(lengths, flu, t)
    param_info = staub_param_info(trial_move=0.01)
    sim_info = {"lengths": lengths, "nx": [128] * 6,
                "meas_types": ["TRPL"] * 6, "num_meas": 6}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": 1, "hard_bounds": 1}
    e_data = ([t] * 6, vals, [np.full(NT, 0.05)] * 6)
    plan = build_likelihood_plan(
        sim_info, param_info, mcmc, e_data, flu,
        hmax=48.0, align_outputs=False, scheme="sdirk3", refactor_every=4)
    move_plan = build_move_plan(param_info, mcmc)
    temps = 2.0 ** np.arange(N_CHAINS)
    base_move = np.array(
        [param_info["trial_move"][n] if param_info["active"][n] else 0.0
         for n in NAMES])
    rng = np.random.default_rng(20260816)
    st0 = np.tile([TRUE[n] for n in NAMES], (N_CHAINS, 1))
    active = np.array([param_info["active"][n] for n in NAMES], dtype=bool)
    st0 = st0 * 10.0 ** (rng.uniform(-0.3, 0.3, st0.shape)
                         * active[None, :])
    print(f"device: {jax.devices()[0]}")

    def timed(run_window, init_ll, states):
        ll = jax.block_until_ready(init_ll(states))
        s, llt, *_ = run_window(states, ll, jnp.asarray(1),
                                jax.random.PRNGKey(1))
        jax.block_until_ready(s)
        k = 1 + window
        t0 = time.perf_counter()
        for _ in range(n_rep):
            s, llt, *_ = run_window(s, llt, jnp.asarray(k),
                                    jax.random.PRNGKey(0))
            k += window
        jax.block_until_ready(s)
        dt = time.perf_counter() - t0
        return n_rep * window * N_CHAINS / dt

    plain = build_mh_kernel(
        plan, move_plan, temps, base_move, temper_freq=10,
        do_tempering=True, window=window, dtype=jnp.float32, backend="auto")
    sps_plain = timed(plain.run_window, plain.init_ll,
                      jnp.asarray(st0, jnp.float32))
    print(f"plain kernel     : {sps_plain:8.1f} walker-steps/s",
          flush=True)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("ens", "chains"))
    shard = build_sharded_mh_kernel(
        plan, move_plan, temps, base_move, temper_freq=10,
        do_tempering=True, window=window, mesh=mesh, n_ens=1,
        dtype=jnp.float32, backend="auto")
    st_s = jax.device_put(jnp.asarray(st0[None], jnp.float32),
                          shard.state_sharding)
    sps_shard = timed(shard.run_window, shard.init_ll, st_s)
    print(f"sharded 1x1 mesh : {sps_shard:8.1f} walker-steps/s "
          f"(overhead {100 * (1 - sps_shard / sps_plain):+.1f}%)",
          flush=True)


if __name__ == "__main__":
    main()
