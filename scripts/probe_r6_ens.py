"""TPU probe: fused multi-ensemble aggregate throughput post-symbolic-
Jacobian (VERDICT r2 weak #1: is the E=8 aggregate >= ~5300 steps/s?).

Same bench staub workload as probe_r6_rampblock (6 curves, nx=128,
h48/F4, 8 tempered chains per ensemble) run through the production
fused path: build_mh_kernel(batch_mult=E) + vmap_ensembles, exactly as
run_mh_fused wires it (inference/metropolis.py:205-222).

Usage: python scripts/probe_r6_ens.py [window] [E ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from metrotrpl_tpu.inference.likelihood import build_likelihood_plan
from metrotrpl_tpu.inference.metropolis import build_mh_kernel, vmap_ensembles
from metrotrpl_tpu.inference.moves import build_move_plan
from metrotrpl_tpu.workloads import (
    STAUB_NAMES as NAMES,
    STAUB_TRUE as TRUE,
    staub_param_info,
)
from probe_r4_window import synth_curves

N_CHAINS = 8
NT = 501
T_END = 2000.0


def main():
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ensembles = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8]

    lengths = [311.0, 2000.0, 311.0, 2000.0, 311.0, 2000.0]
    flu = np.loadtxt("/root/repo/Inputs/"
                     "staub_MAPI_threepower_twothick_fluences.csv",
                     delimiter=",")
    t = np.linspace(0, T_END, NT)
    vals = synth_curves(lengths, flu, t)

    param_info = staub_param_info(trial_move=0.01)
    sim_info = {"lengths": lengths, "nx": [128] * 6,
                "meas_types": ["TRPL"] * 6, "num_meas": 6}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": 1, "hard_bounds": 1}
    uncs = [np.full(NT, 0.05)] * 6
    e_data = ([t] * 6, vals, uncs)
    temps = 2.0 ** np.arange(N_CHAINS)
    base_move = np.array(
        [param_info["trial_move"][n] if param_info["active"][n] else 0.0
         for n in NAMES])
    rng = np.random.default_rng(20260816)
    active = np.array([param_info["active"][n] for n in NAMES], dtype=bool)

    plan = build_likelihood_plan(
        sim_info, param_info, mcmc, e_data, flu,
        hmax=48.0, align_outputs=False, scheme="sdirk3",
        refactor_every=4, escalate=False)
    move_plan = build_move_plan(param_info, mcmc)

    print(f"device: {jax.devices()[0]}")
    for E in ensembles:
        kernel = build_mh_kernel(
            plan, move_plan, temps, base_move, temper_freq=10,
            do_tempering=True, window=window, dtype=jnp.float32,
            backend="auto", batch_mult=E)
        kernel = vmap_ensembles(kernel)
        states0_np = np.tile([TRUE[n] for n in NAMES],
                             (E, N_CHAINS, 1))
        shift = (rng.uniform(-0.3, 0.3, states0_np.shape)
                 * active[None, None, :])
        states = jnp.asarray(states0_np * 10.0 ** shift, jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), E)
        ll_T = jax.block_until_ready(kernel.init_ll(states))
        states, llt, _, _, _, _ = kernel.run_window(
            states, ll_T, jnp.asarray(1), keys)
        jax.block_until_ready(states)

        n_rep = 3
        k = 1 + window
        t0 = time.perf_counter()
        for _ in range(n_rep):
            states, llt, _, _, _, hist = kernel.run_window(
                states, llt, jnp.asarray(k), keys)
            k += window
        jax.block_until_ready(states)
        dt = time.perf_counter() - t0
        sps = n_rep * window * N_CHAINS * E / dt
        print(f"E={E}: {sps:8.1f} aggregate walker-steps/s "
              f"({sps / E:7.1f} per ensemble; {n_rep * window} iters "
              f"in {dt:.2f} s)", flush=True)


if __name__ == "__main__":
    main()
