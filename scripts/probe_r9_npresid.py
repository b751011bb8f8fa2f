"""TPU probe: Newton-convergence resid distribution under newton_plateau.

The round-8 failure predicate reads resid = max |last Newton update| and
flags rows with ~(resid < NEWTON_DIV_TOL=1e-2). With newton_plateau=1 the
plateau's "last update" IS the single full correction (no second iteration
to shrink it), so the healthy band shifts up by ~1/contraction-rate. This
probe measures that shift at posterior-ball states (truth +/- 0.05 and
+/- 0.3 dex on the active staub params) for np in (None, 1), h48/F4,
deciding whether the predicate survives a newton_plateau=1 production
config or needs a recalibrated tolerance.

Usage: python scripts/probe_r9_npresid.py [n_states]
"""

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

import jax
import jax.numpy as jnp

from metrotrpl_tpu.inference.likelihood import (
    build_likelihood_plan,
    make_eval_logll,
)
from metrotrpl_tpu.workloads import (
    STAUB_NAMES as NAMES,
    STAUB_TRUE as TRUE,
    staub_param_info,
)
from probe_r4_window import synth_curves

NT = 501
T_END = 2000.0


def main():
    n_states = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    lengths = [311.0, 2000.0] * 3
    flu = np.loadtxt(os.path.join(
        _REPO, "Inputs", "staub_MAPI_threepower_twothick_fluences.csv"),
        delimiter=",")
    t = np.linspace(0, T_END, NT)
    vals = synth_curves(lengths, flu, t)
    uncs = [np.full(NT, 0.05)] * 6
    e_data = ([t] * 6, vals, uncs)

    param_info = staub_param_info(trial_move=0.01)
    sim_info = {"lengths": lengths, "nx": [128] * 6,
                "meas_types": ["TRPL"] * 6, "num_meas": 6}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": 1, "hard_bounds": 1}
    active = np.array([param_info["active"][n] for n in NAMES], dtype=bool)
    truth = np.array([TRUE[n] for n in NAMES])

    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(20260820)
    for tag, width in (("typical +/-0.05", 0.05), ("wide +/-0.3", 0.3)):
        shift = (rng.uniform(-width, width, (n_states, len(NAMES)))
                 * active[None, :])
        states = jnp.asarray(truth[None, :] * 10.0 ** shift, jnp.float32)
        temps = jnp.ones(n_states, jnp.float32)
        for npl in (None, 1):
            plan = build_likelihood_plan(
                sim_info, param_info, mcmc, e_data, flu,
                hmax=48.0, align_outputs=False, scheme="sdirk3",
                refactor_every=4, escalate=False, newton_plateau=npl)
            ev = jax.jit(make_eval_logll(plan, dtype=jnp.float32,
                                         backend="auto"))
            out = jax.block_until_ready(ev(states, temps))
            r = np.asarray(out["resid"]).ravel()
            fin = np.isfinite(r)
            if not fin.any():
                print(f"{tag:16s} np={npl}: ALL {len(r)} resid entries "
                      "non-finite (every solve diverged)", flush=True)
                continue
            q = np.percentile(r[fin], [50, 90, 99, 100])
            print(f"{tag:16s} np={npl}: resid p50 {q[0]:.2e} p90 {q[1]:.2e}"
                  f" p99 {q[2]:.2e} max {q[3]:.2e}"
                  f" ({int((r[fin] >= 1e-2).sum())}/{fin.sum()} rows >= "
                  f"tol 1e-2, {int((~fin).sum())} non-finite)", flush=True)


if __name__ == "__main__":
    main()
