"""TPU probe: multi-ensemble throughput with chunked evaluation on a 1x1
mesh (single chip) — the spill-proof multi-ensemble mode."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from scripts.probe_r2_perf import NAMES, TRUE, UC, build_eval


def main():
    from metrotrpl_tpu.inference.moves import build_move_plan
    from metrotrpl_tpu.parallel.sharded_mh import build_sharded_mh_kernel

    print(f"device: {jax.devices()[0]}", flush=True)
    K = 8
    window = 100
    base_move = np.full(len(NAMES), 0.01)
    temps = 2.0 ** np.arange(K)
    _, states, _, plan = build_eval(K, "xla", 16, hmax=16.0,
                                    align_outputs=False)
    param_info = {
        "names": NAMES, "unit_conversions": UC,
        "do_log": {n: 1 for n in NAMES}, "active": {n: 1 for n in NAMES},
        "init_guess": dict(TRUE),
        "prior_dist": {n: (1e-32, 1e32) for n in NAMES},
        "trial_move": {n: 0.01 for n in NAMES},
    }
    mp = build_move_plan(param_info, {"hard_bounds": 1})
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("ens", "chains"))

    for E in (2, 4, 8):
        kern = build_sharded_mh_kernel(
            plan, mp, temps, base_move, temper_freq=10, do_tempering=True,
            window=window, mesh=mesh, n_ens=E, dtype=jnp.float32,
            eval_chunk=8)
        st = jnp.broadcast_to(states[None], (E,) + states.shape)
        with mesh:
            ll = kern.init_ll(st)
            out = kern.run_window(st, ll, jnp.asarray(1),
                                  jax.random.PRNGKey(0))
            jax.block_until_ready(out[0])
            st_r, ll_r = out[0], out[1]
            reps, k = 2, 1 + window
            t0 = time.perf_counter()
            for _ in range(reps):
                st_r, ll_r, _, _, _, _ = kern.run_window(
                    st_r, ll_r, jnp.asarray(k), jax.random.PRNGKey(0))
                k += window
            jax.block_until_ready(st_r)
        dt = (time.perf_counter() - t0) / (reps * window)
        print(f"sharded-1x1 chunk=8 E={E} (batch {E*K*6:4d}): "
              f"{dt*1e3:8.3f} ms/iter  aggregate {E*K/dt:7.1f} "
              "walker-steps/s", flush=True)


if __name__ == "__main__":
    main()
