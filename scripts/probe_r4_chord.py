"""TPU probe: chord (stale-Jacobian) stepping in the fused kernel at the
h48 fast config — is it f32-stable AFTER the antisymmetric split, and is
it faster?

Round-2 measured chord as unstable on TPU f32 (docs/TPU_NOTES.md) — but
that predates the antisymmetric split (commit 859c471) which removed the
Jn+Jp cancellation that also broke newton_iters=1 / trbdf2 / hmax>=24
(all re-validated stable by probe_r3_cheap). At hmax=48 the plan has a
~38-step constant-dt plateau; refactor_every=F skips the Jacobian-JVP +
PCR-factorization work on (F-1)/F of those steps.

For each config: evaluate the full staub 48-row likelihood at TRUE and a
chain of perturbed states (relay-safe), compare against the F=1 baseline
at the SAME states, report max |dll| and eval time.

Usage: python scripts/probe_r4_chord.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from probe_r2_perf import build_eval

CONFIGS = [
    # label, refactor_every
    ("h48 F=1 (baseline)", 1),
    ("h48 F=2", 2),
    ("h48 F=4", 4),
    ("h48 F=8", 8),
]
N_STATES = 6


def lls_at_chain(ev, states, temps):
    out = ev(states, temps)
    jax.block_until_ready(out["logll_T"])  # compile
    lls = []
    t0 = time.perf_counter()
    for i in range(N_STATES):
        ll = float(np.asarray(out["logll_T"])[0, 0])
        lls.append(ll)
        shift = 1.0 + 1e-3 * np.tanh(ll) * (1 + 0.1 * i)
        states = states * shift
        out = ev(states, temps)
    lls.append(float(np.asarray(out["logll_T"])[0, 0]))
    dt = (time.perf_counter() - t0) / N_STATES
    return np.array(lls), dt


def main():
    print(f"device: {jax.devices()[0]}")
    base = None
    for label, F in CONFIGS:
        try:
            ev, states, temps, plan = build_eval(
                8, "auto", None, hmax=48.0, align_outputs=False,
                scheme="sdirk3", refactor_every=F)
            fp = plan.fwd[0][1]
            lls, dt = lls_at_chain(ev, states, temps)
            if base is None:
                base = lls
            finite = np.all(np.isfinite(lls))
            dll = (np.max(np.abs(lls - base) / np.abs(base))
                   if finite else np.inf)
            print(f"{label:20s} n_steps={fp.n_steps:3d} n_ramp={fp.n_ramp} "
                  f"eval={dt * 1e3:7.2f} ms finite={finite} "
                  f"max_rel_dll={dll:.2e}", flush=True)
        except Exception as e:
            print(f"{label:20s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
