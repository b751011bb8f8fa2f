"""TPU probe: backend="auto" behavior past the VMEM spill cliff.

Times the fast-mode eval at K=16 chains (96 simultaneous sims, past the
~64-sim cliff) for xla, pallas at several block sizes, and auto; and at
K=8 (48 sims) for xla vs auto. Honest timing (chained inputs + readback).

Usage: python scripts/probe_r2_auto.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

from probe_r2_perf import build_eval, timeit

FAST = dict(hmax=16.0, align_outputs=False)


def main():
    print(f"device: {jax.devices()[0]}")
    configs = [
        ("xla    K8  (48 sims)", 8, "xla", 16),
        ("auto   K8  (48 sims)", 8, "auto", 16),
        ("xla    K16 (96 sims)", 16, "xla", 16),
        ("pallas K16 b16", 16, "pallas", 16),
        ("pallas K16 b32", 16, "pallas", 32),
        ("pallas K16 b48", 16, "pallas", 48),
        ("auto   K16 b16", 16, "auto", 16),
        ("xla    K32 (192 sims)", 32, "xla", 16),
        ("pallas K32 b48", 32, "pallas", 48),
    ]
    for label, K, backend, bb in configs:
        try:
            ev, states, temps, plan = build_eval(K, backend, bb, **FAST)
            dt, val = timeit(ev, states, temps)
            print(f"{label:24s} eval={dt*1e3:8.2f} ms "
                  f"solves/s={K*6/dt:8.1f} ll={val:.6e}", flush=True)
        except Exception as e:
            print(f"{label:24s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
