"""Extend the preserved flagship oracle chain (VERDICT r4 missing #2).

Resumes scripts/.oracle_tmh_3200_* — the cross-round reference-math
flagship chain (serial numpy/scipy LSODA Metropolis, see
posterior_compare.run_oracle_mh; reference math under test:
/root/reference/trial_move_evaluation.py:147-158) — toward a target
iteration count, saving a monitorable partial every 100 iterations.

Proposal: a FIXED symmetric Gaussian whose covariance is re-estimated
from the preserved chain's own post-burn draws at the standard
2.38^2/d scale. Validity: a symmetric fixed proposal cannot change the
stationary distribution, only the mixing rate; switching proposals at a
deterministic iteration (3200) keeps every segment stationarity-
preserving, so the concatenated chain still targets the exact
reference-math posterior (same argument as the preserved chain's own
tpu-covariance proposal, docs/POSTERIOR_r07_flagship.md). The previous
0.4-shrunk proposal accepted 0.43 — above the ~0.23 multivariate
optimum — so the unshrunk scale mixes strictly faster per LSODA solve.

Usage: python scripts/extend_oracle.py [target_iters]
Output: scripts/.oracle_tmh_ext_<target>_<seed>.npz.partial.npz
(consumed directly by scripts/assemble_r09.py, which truncates to the
completed n_done).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import posterior_compare as pc  # noqa: E402

pc.apply_preset("flagship")

HERE = os.path.dirname(os.path.abspath(__file__))
PRESERVED = os.path.join(HERE, ".oracle_tmh_3200_20260816_9879b0941d.npz")


def main():
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    out = os.path.join(HERE, f".oracle_tmh_ext_{target}_{pc.SEED}.npz")
    partial = out + ".partial.npz"

    if os.path.exists(partial):
        prev = np.load(partial)
        n0 = int(prev["n_done"])
        resume = {"n_done": n0, "acc": float(prev["acc"]),
                  **{k: np.asarray(prev[k]) for k in pc.ACTIVE}}
        print(f"resuming extension at {n0}/{target}", flush=True)
    else:
        z = np.load(PRESERVED)
        n0 = len(z[pc.ACTIVE[0]])
        resume = {"n_done": n0, "acc": float(z["acc"]),
                  **{k: np.asarray(z[k]) for k in pc.ACTIVE}}
        print(f"starting extension from preserved {n0}/{target}",
              flush=True)

    # fixed proposal from the chain's own post-burn covariance
    burn = 3200 // 3
    X = np.log10(np.stack([resume[k][burn:3200] for k in pc.ACTIVE],
                          axis=1))
    cov = np.cov(X.T) * (2.38 ** 2 / len(pc.ACTIVE))
    start = {k: float(resume[k][-1]) for k in pc.ACTIVE}

    t, vals = pc.make_dataset()
    samples, acc = pc.run_oracle_mh(t, vals, target,
                                    partial_path=partial,
                                    resume=resume, cov=cov, start=start)
    np.savez(out, acc=acc, **samples)
    print(f"done: {target} iters, acceptance {acc:.3f} -> {out}",
          flush=True)


if __name__ == "__main__":
    main()
