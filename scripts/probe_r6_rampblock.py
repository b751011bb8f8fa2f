"""TPU probe: windowed MH throughput with stepped-ramp chord mode.

Sweeps (refactor_every, ramp_block) on the bench staub workload
(6 curves, nx=128, h48). R=1 is the round-5 production config
(symbolic-Jacobian chord kernel, 2859 walker-steps/s measured); R>1
additionally shares one Newton factorization per R-step block INSIDE
the dt ramp, which is ~65% of per-solve FLOPs at these settings
(docs/TPU_NOTES.md round-5 roofline).

Usage: python scripts/probe_r6_rampblock.py [window] [F:R ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from metrotrpl_tpu.inference.likelihood import build_likelihood_plan
from metrotrpl_tpu.inference.metropolis import build_mh_kernel
from metrotrpl_tpu.inference.moves import build_move_plan
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
    combos = ([tuple(int(x) for x in a.split(":")) for a in sys.argv[2:]]
              or [(4, 1), (4, 4), (4, 8), (8, 8)])

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
    states0_np = np.tile([TRUE[n] for n in NAMES], (N_CHAINS, 1))
    active = np.array([param_info["active"][n] for n in NAMES], dtype=bool)
    shift = rng.uniform(-0.3, 0.3, states0_np.shape) * active[None, :]
    states0_np = states0_np * 10.0 ** shift

    print(f"device: {jax.devices()[0]}")
    for F, R in combos:
        plan = build_likelihood_plan(
            sim_info, param_info, mcmc, e_data, flu,
            hmax=48.0, align_outputs=False, scheme="sdirk3",
            refactor_every=F, ramp_block=R, escalate=False)
        fp = plan.fwd[0][1]
        move_plan = build_move_plan(param_info, mcmc)
        kernel = build_mh_kernel(
            plan, move_plan, temps, base_move, temper_freq=10,
            do_tempering=True, window=window, dtype=jnp.float32,
            backend="auto")
        states = jnp.asarray(states0_np, jnp.float32)
        ll_T = jax.block_until_ready(kernel.init_ll(states))
        states, llt, _, _, _, _ = kernel.run_window(
            states, ll_T, jnp.asarray(1), jax.random.PRNGKey(0))
        jax.block_until_ready(states)

        n_rep = 3
        k = 1 + window
        accepts = []
        t0 = time.perf_counter()
        for _ in range(n_rep):
            states, llt, _, _, _, hist = kernel.run_window(
                states, llt, jnp.asarray(k), jax.random.PRNGKey(0))
            accepts.append(hist[2])
            k += window
        jax.block_until_ready(states)
        dt = time.perf_counter() - t0
        sps = n_rep * window * N_CHAINS / dt
        acc = float(np.mean([np.asarray(a).mean() for a in accepts]))
        print(f"F={F} R={R}: {sps:8.1f} walker-steps/s  accept={acc:.3f}  "
              f"n_steps={fp.n_steps} n_ramp={fp.n_ramp} "
              f"({n_rep * window} iters in {dt:.2f} s)", flush=True)


if __name__ == "__main__":
    main()
