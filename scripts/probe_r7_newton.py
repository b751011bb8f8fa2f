"""TPU probe: plateau-phase Newton-iteration count (newton_plateau).

The fused kernel is dependency-depth-bound (docs/TPU_NOTES.md roofline):
each SDIRK stage's Newton chain is serial, so cutting plateau stages
from 2 Newton corrections to 1 removes ~1/2 of the critical path over
the ~(n_steps - n_ramp) constant-dt steps. The ramp keeps the full
count (transient-dominated; a global newton_iters=1 was rejected at
rel dll 2.6e-3 — probe_r5_ramp findings).

Measures, on the bench staub workload (6 curves, nx=128, h48/F4,
8 tempered chains, E=8 fused ensembles):
  1. aggregate walker-steps/s with newton_plateau in (None, 1)
  2. the likelihood shift |dll| it introduces at K x 6 solves
     (acceptance-relevant scale: comparable to the h48/F4 chord error)

Usage: python scripts/probe_r7_newton.py [window] [E]
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
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 8

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
    from metrotrpl_tpu.inference.moves import build_move_plan
    move_plan = build_move_plan(param_info, mcmc)

    print(f"device: {jax.devices()[0]}")

    states0_np = np.tile([TRUE[n] for n in NAMES], (E, N_CHAINS, 1))
    shift = (rng.uniform(-0.3, 0.3, states0_np.shape)
             * active[None, None, :])
    states0 = jnp.asarray(states0_np * 10.0 ** shift, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), E)

    lls = {}
    # (refactor_every, newton_plateau) — accuracy measured on CPU f64
    # (np_sweep): F4/N2 baseline; F4/N1 1.9e-3 dlog10 (REJECTED);
    # F2/N1 8.5e-4; F1/N1 3.1e-4 (near the 2.3e-4 h48/F4 budget)
    for F, npl in ((4, None), (4, 1), (2, 1), (1, 1)):
        plan = build_likelihood_plan(
            sim_info, param_info, mcmc, e_data, flu,
            hmax=48.0, align_outputs=False, scheme="sdirk3",
            refactor_every=F, escalate=False, newton_plateau=npl)
        kernel = build_mh_kernel(
            plan, move_plan, temps, base_move, temper_freq=10,
            do_tempering=True, window=window, dtype=jnp.float32,
            backend="auto", batch_mult=E)
        kernel = vmap_ensembles(kernel)
        ll_T = jax.block_until_ready(kernel.init_ll(states0))
        lls[(F, npl)] = np.asarray(ll_T)
        states, llt, _, _, _, _ = kernel.run_window(
            states0, ll_T, jnp.asarray(1), keys)
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
        print(f"F={F} newton_plateau={npl}: {sps:8.1f} aggregate "
              f"walker-steps/s ({n_rep * window} iters in {dt:.2f} s)",
              flush=True)

    ref = lls[(4, None)]
    for key, ll in lls.items():
        if key == (4, None):
            continue
        fin = np.isfinite(ll) & np.isfinite(ref)
        n_dis = int((~np.isfinite(ll) ^ ~np.isfinite(ref)).sum())
        d = np.abs(ll[fin] - ref[fin])
        if d.size == 0:
            # the +/-0.3-dex starting ball can land every row on -inf
            # under the round-8 predicate; the f64 accuracy sweep in the
            # comment above is the accuracy evidence in that case
            print(f"{key}: no mutually finite ll at the probe states "
                  f"({n_dis} disagree on -inf)")
            continue
        print(f"{key}: |dll| max {d.max():.3e} mean {d.mean():.3e} over "
              f"{fin.sum()}/{fin.size} finite ({n_dis} disagree on -inf)")


if __name__ == "__main__":
    main()
