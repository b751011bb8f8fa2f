"""TPU sweep on the final round-2 form (antisymmetric split + plane tuple):
xla vs pallas at B=48/96/192 to confirm or move the auto-backend threshold.

Honest timing per docs/TPU_NOTES.md: timed inputs chain from prior outputs
(the relay caches identical calls); first config after process start is a
warm-up and re-measured.

Usage: python scripts/sweep_r2_final.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from metrotrpl_tpu.inference.likelihood import (
    build_likelihood_plan,
    make_eval_logll,
)

UC = {"n0": 1e-21, "p0": 1e-21, "mu_n": 1e5, "mu_p": 1e5, "ks": 1e12,
      "Cn": 1e33, "Cp": 1e33, "Sf": 1e-2, "Sb": 1e-2}
NAMES = ["n0", "p0", "mu_n", "mu_p", "ks", "Cn", "Cp", "Sf", "Sb",
         "tauN", "tauP", "eps", "Tm"]
TRUE = {"n0": 1e8, "p0": 3e15, "mu_n": 20, "mu_p": 20, "ks": 4.8e-11,
        "Cn": 4.4e-29, "Cp": 4.4e-29, "Sf": 10, "Sb": 10,
        "tauN": 511, "tauP": 871, "eps": 10, "Tm": 300}


def build_eval(n_chains, backend, block_b):
    param_info = {
        "names": NAMES,
        "unit_conversions": UC,
        "do_log": {n: 1 for n in NAMES},
        "active": {n: 1 for n in NAMES},
        "init_guess": dict(TRUE),
        "prior_dist": {n: (1e-32, 1e32) for n in NAMES},
        "trial_move": {n: 0.01 for n in NAMES},
    }
    lengths = [311.0, 2000.0] * 3
    t = np.linspace(0, 2000, 501)
    vals = [np.linspace(21, 16, 501)] * 6
    uncs = [np.full(501, 0.05)] * 6
    e_data = ([t] * 6, vals, uncs)
    sim_info = {"lengths": lengths, "nx": [128] * 6,
                "meas_types": ["TRPL"] * 6, "num_meas": 6}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": 1}
    flu = np.loadtxt("/root/repo/Inputs/"
                     "staub_MAPI_threepower_twothick_fluences.csv",
                     delimiter=",")
    plan = build_likelihood_plan(sim_info, param_info, mcmc, e_data, flu,
                                 escalate=False, hmax=16.0,
                                 align_outputs=False)
    ev = jax.jit(make_eval_logll(plan, dtype=jnp.float32, backend=backend,
                                 block_b=block_b))
    states = jnp.asarray(np.tile([TRUE[n] for n in NAMES], (n_chains, 1)),
                         jnp.float32)
    temps = jnp.asarray(2.0 ** np.arange(n_chains), jnp.float32)
    return ev, states, temps


def timeit(ev, states, temps, n_rep=4):
    out = ev(states, temps)
    jax.block_until_ready(out["logll_T"])
    t0 = time.perf_counter()
    for _ in range(n_rep):
        shift = 1.0 + 1e-4 * jnp.tanh(out["logll_T"][0, 0])
        states = states * shift
        out = ev(states, temps)
    val = float(np.asarray(out["logll_T"])[0, 0])
    dt = (time.perf_counter() - t0) / n_rep
    return dt, val


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    configs = []
    for K in (8, 16, 32):
        configs.append((f"xla    B={K*6:3d}", K, "xla", 16))
        for bb in (16, 48):
            configs.append((f"pallas B={K*6:3d} b{bb}", K, "pallas", bb))
    # repeat the first config at the end: first-measured is warm-up-skewed
    configs.append(("xla    B= 48 (re)", 8, "xla", 16))
    for label, K, backend, bb in configs:
        try:
            ev, states, temps = build_eval(K, backend, bb)
            dt, val = timeit(ev, states, temps)
            solves = K * 6
            print(f"{label:22s} eval={dt*1e3:8.2f} ms "
                  f"solves/s={solves/dt:8.1f} ll={val:.4e}", flush=True)
        except Exception as e:
            print(f"{label:22s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
