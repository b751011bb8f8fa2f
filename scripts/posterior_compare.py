"""Cross-implementation posterior agreement artifact (VERDICT r1 missing #2).

Two samplers fit the SAME noisy synthetic dataset (2 TRPL curves, 311 and
2000 nm, nx=32, truth = staub MAPI parameters, 3 active params):

* "oracle MH": a reference-faithful serial Metropolis sampler written in
  plain numpy/scipy — scipy LSODA forward solves (the reference's solver),
  log-space uniform proposals, hard-bounds retry, the reference's tempered
  Gaussian likelihood at T=1. Shares NO code with the JAX path.
* "tpu MH": this framework's compiled kernel (fast solver mode) with 8
  untempered chains.

Outputs docs/POSTERIOR_r02.md with per-parameter posterior mean/sigma of
both samplers and the truth. Agreement within the posterior sigmas is the
acceptance contract from BASELINE.json.

Usage: python scripts/posterior_compare.py [n_iters_oracle] [n_iters_tpu]
           [hmax] [outname] [--oracle-only]
hmax parameterizes the tpu fast mode (default 16); outname the report
file under docs/ (default POSTERIOR_r02.md).  --oracle-only (anywhere on
the command line) runs just the CPU oracle half to warm its cache — the
oracle is hmax-independent and cached, so h-sweeps re-run only the tpu
half.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NX = 32
NT = 101
T_END = 1000.0
LENGTHS = [311.0, 2000.0]
from metrotrpl_tpu.workloads import (  # noqa: E402
    STAUB_NAMES as NAMES,
    STAUB_TRUE as TRUE,
    STAUB_UC as UC,
)

ACTIVE = ("ks", "tauN", "Sf")
START = {"ks": 2e-11, "tauN": 300.0, "Sf": 30.0}
PRIOR = {"ks": (1e-12, 1e-9), "tauN": (1, 4000), "Sf": (1e-1, 1e3)}
WIDTH = 0.02           # log10 proposal half-width
SIGMA = 0.05           # model uncertainty
UNC = 0.05             # data uncertainty (log10)
SEED = 20260816
#: per-measurement (fluence [cm^-2], absorption alpha [cm^-1])
FLU = [(2.12e11, 6e4)] * len(LENGTHS)
PRESET = "3p"


def apply_preset(name):
    """Mutate the module workload constants. Presets:

    * ``3p`` (default) — 2 curves, 3 active params (the r02/r03 artifact).
    * ``full`` — the full staub shape: 6 curves (3 fluences x 2
      thicknesses, the shipped fluence file), ALL 10 active parameters
      (reference MCMC_script_writer.py active set). nx stays 32 and
      t <= 1000 ns to keep the serial LSODA oracle tractable on this
      host's single CPU core.
    * ``flagship`` — the EXACT reference workload shape (reference
      MCMC_script_writer.py:46-156 / Inputs/mcmc0.txt, the BASELINE.json
      north star): 6 curves, nx=128, 501 points over 2000 ns, 10 active
      parameters. The serial LSODA oracle costs ~3 s/iteration here, so
      the oracle leg uses the TPU-covariance ridge proposal
      (--tpu-ridge) and runs for hours in the background.
    """
    global NX, NT, T_END, LENGTHS, FLU, ACTIVE, START, PRIOR, WIDTH, PRESET
    if name == "3p":
        return
    if name not in ("full", "flagship"):
        raise SystemExit(f"unknown preset {name!r} (3p | full | flagship)")
    from metrotrpl_tpu.workloads import STAUB_INACTIVE, STAUB_PRIOR
    PRESET = name
    if name == "flagship":
        NX = 128
        NT = 501
        T_END = 2000.0
    else:
        NT = 101
        T_END = 1000.0
    LENGTHS = [311.0, 2000.0] * 3
    flu = np.loadtxt(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "Inputs",
        "staub_MAPI_threepower_twothick_fluences.csv"), delimiter=",")
    FLU = [(row[0], row[1]) for row in flu]
    ACTIVE = tuple(n for n in NAMES if n not in STAUB_INACTIVE)
    # mild off-truth starts (seeded): +/- 0.15 decades on every active param
    rng = np.random.default_rng(SEED + 7)
    START = {n: float(TRUE[n] * 10 ** rng.uniform(-0.15, 0.15))
             for n in ACTIVE}
    PRIOR = {n: STAUB_PRIOR[n] for n in ACTIVE}
    WIDTH = 0.01  # reference trial_move default (MCMC_script_writer.py)


def _ic(m):
    L = LENGTHS[m]
    dx = L / NX
    x = np.linspace(dx / 2, L - dx / 2, NX)
    from metrotrpl_tpu.oracle.scipy_reference import beer_lambert
    f, a = FLU[m]
    return beer_lambert(f * 1e-14, a * 1e-7, x)


def make_dataset():
    from metrotrpl_tpu.oracle import solve_reference

    pm = {k: v * UC.get(k, 1) for k, v in TRUE.items()}
    t = np.linspace(0, T_END, NT)
    rng = np.random.default_rng(SEED)
    vals = []
    for m, L in enumerate(LENGTHS):
        pl = solve_reference(_ic(m), L, NX, t, pm)
        vals.append(np.log10(pl) + rng.normal(0, UNC, NT))
    return t, vals


def oracle_logll(t, vals, state):
    """Reference-math likelihood: scipy LSODA solve + tempered Gaussian
    residual at T=1 (reference trial_move_evaluation.py:147-158)."""
    from metrotrpl_tpu.oracle import solve_reference

    pm = {k: v * UC.get(k, 1) for k, v in state.items()}
    ll = 0.0
    for m, (L, v) in enumerate(zip(LENGTHS, vals)):
        try:
            # rhs="native" is the compiled transcription of the same RHS
            # (bit-identical dy, verified) — ~3x faster LSODA callbacks
            pl = solve_reference(_ic(m), L, NX, t, pm, rhs="native")
        except Exception:
            return -np.inf
        if not np.all(np.isfinite(pl)) or np.any(pl <= 0):
            return -np.inf
        err2 = (np.log10(pl) - v) ** 2
        ll -= np.sum(err2 / (SIGMA ** 2 + 2 * UNC ** 2))
    return ll


def run_oracle_mh(t, vals, n_iters, partial_path=None, resume=None,
                  cov=None, start=None):
    """Serial reference-math Metropolis chain.

    cov : optional (d, d) log10-space proposal covariance. None (default)
        = the reference's per-parameter uniform proposal of half-width
        WIDTH. Given = a symmetric Gaussian ridge proposal x' = x + L z
        (L = chol(cov)) — used as phase 2 of the two-phase scheme for
        strongly correlated posteriors: phase 1 (uniform) estimates the
        ridge covariance, phase 2 runs a FIXED-covariance Markov chain
        whose samples alone enter the comparison. The proposal is
        symmetric either way, so the stationary distribution (the shared
        truncated posterior) is identical; only the mixing rate differs.
    start : optional {param: value} initial state (phase 2 starts from
        the warmup chain's last draw).
    """
    state = dict(TRUE)
    state.update(START)
    if start is not None:
        state.update(start)
    samples = {k: np.empty(n_iters) for k in ACTIVE}
    n_acc = 0
    it0 = 0
    # phase-2 chains draw from an independent substream so the warmup
    # and ridge chains share no random numbers
    seed0 = SEED + (100001 if cov is not None else 1)
    L_chol = None
    if cov is not None:
        d = len(ACTIVE)
        L_chol = np.linalg.cholesky(cov + 1e-12 * np.eye(d))
    if resume is not None:
        # Continue a killed run from its last saved state. MH is Markov,
        # so restarting from the last sample with a fresh RNG substream
        # yields a valid chain (the substream is keyed off the resume
        # point for reproducibility of the resumed portion).
        it0 = int(resume["n_done"])
        for k in ACTIVE:
            samples[k][:it0] = resume[k]
            state[k] = float(resume[k][-1])
        n_acc = int(round(float(resume["acc"]) * it0))
        print(f"  (oracle MH resuming at {it0}/{n_iters})", flush=True)
    rng = np.random.default_rng(seed0 + it0)
    x = {k: np.log10(state[k]) for k in ACTIVE}
    ll = oracle_logll(t, vals, state)
    clock = time.perf_counter()
    for it in range(it0, n_iters):
        # symmetric proposal with hard-bounds retry
        # (reference trial_move_generation.py:51-97)
        for _ in range(100):
            if L_chol is not None:
                step = L_chol @ rng.standard_normal(len(ACTIVE))
                xn = {k: x[k] + step[j] for j, k in enumerate(ACTIVE)}
            else:
                xn = {k: x[k] + WIDTH * (2 * rng.random() - 1)
                      for k in ACTIVE}
            if not all(PRIOR[k][0] < 10 ** xn[k] < PRIOR[k][1]
                       for k in ACTIVE):
                continue
            # the tpu kernel's approve_move also screens
            # |log10 tauN - log10 tauP| <= 2 (reference tn_tp_close) and
            # p0 > n0 (reference p0_greater); apply the same support here
            # so both samplers target the same distribution. (Both are
            # no-ops for the current presets' priors — the 3p cached
            # oracle samples stay valid.)
            ltn = xn.get("tauN", np.log10(state["tauN"]))
            ltp = xn.get("tauP", np.log10(state["tauP"]))
            if abs(ltn - ltp) > 2:
                continue
            if 10 ** xn.get("p0", np.log10(state["p0"])) <= state["n0"]:
                continue
            break
        trial = dict(state)
        trial.update({k: 10 ** xn[k] for k in ACTIVE})
        ll_new = oracle_logll(t, vals, trial)
        if np.log(rng.random()) < ll_new - ll:
            x, state, ll = xn, trial, ll_new
            n_acc += 1
        for k in ACTIVE:
            samples[k][it] = 10 ** x[k]
        if (it + 1) % 100 == 0:
            print(f"  oracle MH {it + 1}/{n_iters} "
                  f"({(time.perf_counter() - clock) / (it + 1 - it0):.2f} "
                  f"s/iter, accept {n_acc / (it + 1):.2f})", flush=True)
            if partial_path:
                # monitorable progress snapshot (the full cache is only
                # written on completion)
                np.savez(partial_path, n_done=it + 1, acc=n_acc / (it + 1),
                         **{k: samples[k][:it + 1] for k in ACTIVE})
    return samples, n_acc / n_iters


def run_tpu_mh(t, vals, n_iters, n_chains=8, hmax=16.0, refactor=1,
               refine=1, newton_plateau=None, backend="auto", temper=0,
               partial_path=None):
    """temper=Kt > 0 runs the PRODUCTION tempered sampler instead of
    untempered chains: `n_chains` independent ensembles of Kt
    temperatures (ladder 2^0..2^(Kt-1), reference README.md:41-67
    guidance, swap every 10), fused through vmap_ensembles; only each
    ensemble's T=1 cold chain enters the returned samples — tempering
    preserves the T=1 marginal exactly while mixing across the
    mu_n/mu_p ridge orders of magnitude faster (VERDICT r4 ask #5)."""
    import jax

    # honor an explicit JAX_PLATFORMS (e.g. =cpu to run the compiled
    # kernel host-side) over the sitecustomize platform pin
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    # x64 gates the f64-emulated escalation rung (the nx>=96 repair path
    # that covers the flagship ridge arm); the walk itself stays f32
    jax.config.update("jax_enable_x64", True)
    from metrotrpl_tpu import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from metrotrpl_tpu.inference.likelihood import build_likelihood_plan
    from metrotrpl_tpu.inference.metropolis import build_mh_kernel
    from metrotrpl_tpu.inference.moves import build_move_plan

    param_info = {
        "names": NAMES,
        "unit_conversions": UC,
        "do_log": {n: 1 for n in NAMES},
        "active": {n: int(n in ACTIVE) for n in NAMES},
        "init_guess": {**TRUE, **START},
        "prior_dist": {n: PRIOR.get(n, (1e-32, 1e32)) for n in NAMES},
        "trial_move": {n: WIDTH for n in NAMES},
    }
    M = len(LENGTHS)
    sim_info = {"lengths": LENGTHS, "nx": [NX] * M,
                "meas_types": ["TRPL"] * M, "num_meas": M}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": SIGMA, "hard_bounds": 1}
    iniPar = np.array([[f, a, 1] for f, a in FLU])
    e_data = ([t] * M, vals, [np.full(NT, UNC)] * M)
    plan = build_likelihood_plan(sim_info, param_info, mcmc, e_data, iniPar,
                                 hmax=hmax, align_outputs=False,
                                 refactor_every=refactor, refine=refine,
                                 newton_plateau=newton_plateau)
    mp = build_move_plan(param_info, mcmc)
    base_move = np.array([WIDTH if n in ACTIVE else 0.0 for n in NAMES])

    window = min(500, n_iters)
    init = np.array([param_info["init_guess"][n] for n in NAMES])
    key = jax.random.PRNGKey(SEED)
    clock = time.perf_counter()
    # inline escalation = production semantics: chord-mode solves that
    # collapse at off-truth states (observed for mu ~ 30-70 at nx=32)
    # re-run on the escalated plan inside the kernel instead of being
    # silently rejected — without it the tpu sampler cannot traverse
    # ~1/3 of the full preset's posterior (docs/LL_AGREEMENT_r05.md)
    if temper:
        temps = 2.0 ** np.arange(int(temper))
        E = n_chains            # independent tempered ensembles
        # SEQUENTIAL ensembles through one compiled single-ensemble
        # kernel (run_ensembles_sequential schedule): the E window calls
        # dispatch asynchronously so the chip runs them gaplessly, the
        # program stays small (the vmapped variant with the f64
        # escalation branch is the largest program in the codebase), and
        # the escalation lax.cond stays a REAL branch — ensembles whose
        # window never touches the stiff region skip the f64 solve
        # entirely instead of paying the vmapped select on every call.
        kern = build_mh_kernel(
            plan, mp, temps, base_move, temper_freq=10,
            do_tempering=True, window=window, dtype=jnp.float32,
            escalate="inline", backend=backend)
        states = [jnp.asarray(np.tile(init, (len(temps), 1)), jnp.float32)
                  for _ in range(E)]
        keys = jax.random.split(key, E)
        ll = [kern.init_ll(s) for s in states]
        hist_states = []
        hist_accept = []
        k = 0
        while k < n_iters:
            outs = [kern.run_window(states[e], ll[e], jnp.asarray(k),
                                    keys[e]) for e in range(E)]
            states = [o[0] for o in outs]
            ll = [o[1] for o in outs]
            # per-ensemble (window, K, P) -> cold chain, (window, E, P)
            hist_states.append(np.stack(
                [np.asarray(o[5][0][:, 0]) for o in outs], axis=1))
            hist_accept.append(np.stack(
                [np.asarray(o[5][2][:, 0]) for o in outs], axis=1))
            k += window
            print(f"  tpu MH (tempered x{int(temper)}) {k}/{n_iters} "
                  f"({E * len(temps) * k / (time.perf_counter() - clock):.0f}"
                  " walker-steps/s)", flush=True)
            if partial_path:
                # harvestable progress snapshot (the full cache is only
                # written on completion; the flagship tempered leg runs
                # ~2 iters/s through the inline f64-rung kernel, so a
                # deadline harvest must not lose the completed windows)
                hp = np.concatenate(hist_states, axis=0)[:k]
                ap = np.concatenate(hist_accept, axis=0)[:k]
                np.savez(partial_path, n_done=min(k, n_iters),
                         acc=float(ap.mean()),
                         **{p: hp[:, :, NAMES.index(p)] for p in ACTIVE})
    else:
        temps = np.ones(n_chains)
        kern = build_mh_kernel(plan, mp, temps, base_move, temper_freq=10,
                               do_tempering=False, window=window,
                               dtype=jnp.float32, escalate="inline",
                               backend=backend)
        states = jnp.asarray(np.tile(init, (n_chains, 1)), jnp.float32)
        ll = kern.init_ll(states)
        hist_states = []
        hist_accept = []
        k = 0
        while k < n_iters:
            states, ll, _, _, _, hist = kern.run_window(states, ll,
                                                     jnp.asarray(k), key)
            hist_states.append(np.asarray(hist[0]))
            hist_accept.append(np.asarray(hist[2]))
            k += window
            print(f"  tpu MH {k}/{n_iters} "
                  f"({n_chains * k / (time.perf_counter() - clock):.0f} "
                  "walker-steps/s)", flush=True)
    h = np.concatenate(hist_states, axis=0)[:n_iters]   # (iters, K|E, P)
    acc = np.concatenate(hist_accept, axis=0)[:n_iters]
    samples = {p: h[:, :, NAMES.index(p)] for p in ACTIVE}
    return samples, float(acc.mean())


#: bump to invalidate cached tpu chains when the kernel's sampling
#: behavior changes (rev 2: escalation ladder drops hmax to the
#: validated default + refine x2 chord-free, and still-failed rows
#: concede -inf; rev 3: dynamic Newton-convergence failure predicate —
#: partial collapses above the underflow clamp now escalate too,
#: inference/likelihood.py NEWTON_DIV_TOL; rev 4: round-10 solver
#: robustness + escalation redesign — trust-region-damped Newton
#: (solver.sdirk.NEWTON_DAMP), nx-aware NEWTON_DIV_TOL default
#: (0.1 at nx<=64, 1.0 at nx>=96), nx-aware escalation rung
#: (h<=4 / h<=16, chord-free, base refine), and the deterministic
#: fit-score escalation gate, docs/TPU_NOTES.md round-10; rev 5:
#: round-5 f64-emulated escalation rung at nx>=96 — the walk can now
#: cover the high-mobility ridge arm the f32 ladder could not
#: (scripts/probe_r14_ridge64.py) — plus the scale-aware gate score)
TPU_SAMPLER_REV = 5


def _cached_tpu_mh(t, vals, n_iters, hmax, refactor, refine=1, n_chains=8,
                   newton_plateau=None, temper=0):
    """Cache the tpu half like the oracle half: the two are independent,
    so the tpu chain can run (on the idle accelerator) while the oracle
    extends (on the host core), and the final z-test assembles both from
    cache. Non-default refine/n_chains/newton_plateau/temper extend the
    key (conditionally, so existing default-shape caches stay valid)."""
    import hashlib

    consts = repr((NX, NT, T_END, LENGTHS, sorted(TRUE.items()), ACTIVE,
                   sorted(START.items()), sorted(PRIOR.items()),
                   WIDTH, SIGMA, UNC, FLU, hmax, refactor,
                   TPU_SAMPLER_REV)
                  + ((refine, n_chains)
                     if (refine != 1 or n_chains != 8) else ())
                  + (("np", newton_plateau)
                     if newton_plateau is not None else ())
                  + (("temper", temper) if temper else ()))
    tag = hashlib.sha1(consts.encode()).hexdigest()[:10]
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".tpu_mh_{n_iters}_{SEED}_{tag}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        print(f"  (tpu MH from cache {cache})", flush=True)
        return {k: z[k] for k in ACTIVE}, float(z["acc"])
    samples, acc = run_tpu_mh(t, vals, n_iters, hmax=hmax,
                              refactor=refactor, refine=refine,
                              n_chains=n_chains,
                              newton_plateau=newton_plateau, temper=temper,
                              partial_path=cache + ".partial.npz")
    np.savez(cache, acc=acc, **samples)
    return samples, acc


def _cached_oracle_mh(t, vals, n_iters):
    """The oracle half is hmax-independent, so cache it: h-sweeps re-run
    only the tpu half.  The cache key hashes every dataset/sampler
    constant, so editing any of them invalidates old caches instead of
    silently comparing against a stale oracle posterior."""
    import hashlib

    consts = repr((NX, NT, T_END, LENGTHS, sorted(TRUE.items()), ACTIVE,
                   sorted(START.items()), sorted(PRIOR.items()),
                   WIDTH, SIGMA, UNC)
                  + ((FLU,) if PRESET != "3p" else ()))
    tag = hashlib.sha1(consts.encode()).hexdigest()[:10]
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".oracle_mh_{n_iters}_{SEED}_{tag}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        print(f"  (oracle MH from cache {cache})", flush=True)
        return {k: z[k] for k in ACTIVE}, float(z["acc"])
    resume = None
    if os.path.exists(cache + ".partial.npz"):
        part = np.load(cache + ".partial.npz")
        if int(part["n_done"]) < n_iters:
            resume = part
    samples, acc = run_oracle_mh(t, vals, n_iters,
                                 partial_path=cache + ".partial.npz",
                                 resume=resume)
    np.savez(cache, acc=acc, **samples)
    return samples, acc


def _cached_oracle_ridge(t, vals, n_iters, warm_n):
    """Two-phase oracle for strongly correlated (ridge) posteriors —
    the full preset's degenerate pairs (Sf/Sb, Cn/Cp, mu_n/mu_p) mix
    orders of magnitude too slowly under the per-parameter uniform
    proposal (ESS ~ 4-8 at 16k iterations) for a mean-level z-test.
    Phase 1: the cached uniform-proposal chain (`warm_n` iterations)
    estimates the log10 posterior covariance (post-burn, scaled by the
    optimal 2.38^2/d). Phase 2: a FRESH fixed-covariance Gaussian MH
    (independent RNG substream, started from the warmup's last draw)
    whose samples alone are compared. The proposal stays symmetric, so
    both phases target the identical truncated posterior; adaptation is
    frozen before phase 2, keeping the compared chain strictly
    Markovian."""
    import hashlib

    warm, _ = _cached_oracle_mh(t, vals, warm_n)
    X = np.log10(np.stack([warm[k][warm_n // 3:] for k in ACTIVE], axis=1))
    cov = np.cov(X.T) * (2.38 ** 2 / len(ACTIVE))
    start = {k: float(warm[k][-1]) for k in ACTIVE}

    consts = repr((NX, NT, T_END, LENGTHS, sorted(TRUE.items()), ACTIVE,
                   sorted(START.items()), sorted(PRIOR.items()),
                   WIDTH, SIGMA, UNC, FLU, warm_n,
                   np.round(cov, 12).tolist()))
    tag = hashlib.sha1(consts.encode()).hexdigest()[:10]
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".oracle_rmh_{n_iters}_{SEED}_{tag}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        print(f"  (ridge oracle MH from cache {cache})", flush=True)
        return {k: z[k] for k in ACTIVE}, float(z["acc"])
    resume = None
    if os.path.exists(cache + ".partial.npz"):
        part = np.load(cache + ".partial.npz")
        if int(part["n_done"]) < n_iters:
            resume = part
    samples, acc = run_oracle_mh(t, vals, n_iters,
                                 partial_path=cache + ".partial.npz",
                                 resume=resume, cov=cov, start=start)
    np.savez(cache, acc=acc, **samples)
    return samples, acc


def _cached_oracle_ridge_tpu(t, vals, n_iters, tpu_n, hmax, refactor,
                             n_chains=8, scale=1.0):
    """Ridge-proposal oracle whose proposal covariance comes from the
    cached TPU chains instead of a CPU warmup chain (the flagship-preset
    oracle: a uniform-proposal warmup long enough to estimate a 10-d
    covariance would alone cost days at ~3 s/LSODA-iteration on this
    host's single core).

    Validity: the proposal is a FIXED symmetric Gaussian (x' = x + L z),
    so the oracle chain's stationary distribution is the exact
    reference-math posterior regardless of where the covariance numbers
    came from — a proposal can change the MIXING RATE only, never the
    target. If the TPU posterior (and hence the covariance estimate)
    were wrong, the oracle would simply mix worse and the reported ESS
    would expose it; it cannot be pulled toward the TPU answer. The
    chain starts at the TPU posterior mean and burns n_iters//3 like
    every other leg, so with ESS >~ 100 the start point is forgotten
    many times over."""
    import hashlib

    tpu_s, _ = _cached_tpu_mh(t, vals, tpu_n, hmax, refactor,
                              n_chains=n_chains)
    burn = tpu_n // 3
    X = np.log10(np.stack(
        [np.asarray(tpu_s[k])[burn:].ravel() for k in ACTIVE], axis=1))
    # scale < 1 shrinks the proposal (acceptance tuning: the flagship
    # ridge is longer than the local posterior curvature, so the raw
    # 2.38^2/d optimal-Gaussian scale over-steps once the chain enters
    # a narrow ridge section — measured acceptance 0.04)
    cov = np.cov(X.T) * (2.38 ** 2 / len(ACTIVE)) * scale ** 2
    start = {k: float(10 ** X[:, j].mean())
             for j, k in enumerate(ACTIVE)}

    consts = repr((NX, NT, T_END, LENGTHS, sorted(TRUE.items()), ACTIVE,
                   sorted(START.items()), sorted(PRIOR.items()),
                   WIDTH, SIGMA, UNC, FLU, "tpucov", tpu_n,
                   np.round(cov, 12).tolist()))
    tag = hashlib.sha1(consts.encode()).hexdigest()[:10]
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".oracle_tmh_{n_iters}_{SEED}_{tag}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        print(f"  (tpu-cov ridge oracle MH from cache {cache})", flush=True)
        return {k: z[k] for k in ACTIVE}, float(z["acc"])
    resume = None
    if os.path.exists(cache + ".partial.npz"):
        part = np.load(cache + ".partial.npz")
        if int(part["n_done"]) < n_iters:
            resume = part
    samples, acc = run_oracle_mh(t, vals, n_iters,
                                 partial_path=cache + ".partial.npz",
                                 resume=resume, cov=cov, start=start)
    np.savez(cache, acc=acc, **samples)
    return samples, acc


def run_ll_check(t, vals, n_states, hmax, refactor, warm_n, ridge_n,
                 outname, tpu_n=0):
    """Dense log-likelihood agreement on posterior-typical states.

    The mean-level z-test is bounded by the ORACLE's mixing on degenerate
    ridges (Sf/Sb ESS ~ 10 even under the ridge proposal). This check has
    no mixing error at all: draw states from the cached oracle chains
    (warmup + ridge, covering everywhere the oracle posterior visits,
    including regions the tpu chains haven't) — and, when ``tpu_n`` names
    a cached tpu run, from the tpu chains too, closing the converse gap
    (regions the TPU walk visits that the oracle hasn't) — evaluate BOTH
    log-likelihoods at each state, and bound |dll|. If sup |dll| <= eps
    over the typical set, the two samplers' stationary densities agree
    within e^(2 eps) pointwise there — a strictly stronger statement than
    mean agreement, independent of either chain's autocorrelation.
    """
    import jax
    import jax.numpy as jnp

    from metrotrpl_tpu.inference.likelihood import build_likelihood_plan
    from metrotrpl_tpu.inference.metropolis import build_mh_kernel
    from metrotrpl_tpu.inference.moves import build_move_plan

    # posterior-typical states: thin every cached chain set post-burn
    warm, _ = _cached_oracle_mh(t, vals, warm_n)
    ridge, _ = _cached_oracle_ridge(t, vals, ridge_n, warm_n)
    # (samples, n_draws, burn): oracle chains burn their first third;
    # the tpu source is pre-sliced post-burn so its burn is 0
    sources = [(warm, warm_n, warm_n // 3), (ridge, ridge_n, ridge_n // 3)]
    if tpu_n:
        tpu_s, _ = _cached_tpu_mh(t, vals, tpu_n, hmax, refactor)
        # (iters, K) chains -> flattened post-burn draws
        tpu_flat = {k: np.asarray(tpu_s[k])[tpu_n // 3:].ravel()
                    for k in ACTIVE}
        sources.append((tpu_flat, len(tpu_flat[ACTIVE[0]]), 0))
    halves = []
    for samples, n, burn in sources:
        idx = np.linspace(burn, n - 1, n_states // len(sources)).astype(int)
        halves.append({k: np.asarray(samples[k])[idx] for k in ACTIVE})
    chosen = {k: np.concatenate([h[k] for h in halves]) for k in ACTIVE}
    S = len(chosen[ACTIVE[0]])

    # oracle ll (LSODA f64, serial)
    ll_o = np.empty(S)
    clock = time.perf_counter()
    for i in range(S):
        state = dict(TRUE)
        state.update({k: float(chosen[k][i]) for k in ACTIVE})
        ll_o[i] = oracle_logll(t, vals, state)
        if (i + 1) % 32 == 0:
            print(f"  ll-check oracle {i + 1}/{S} "
                  f"({(time.perf_counter() - clock) / (i + 1):.2f} s/state)",
                  flush=True)

    # tpu ll: the SAME kernel evaluation the production sampler uses
    # (fast solver mode, f32), chunked as untempered "chains"
    param_info = {
        "names": NAMES,
        "unit_conversions": UC,
        "do_log": {n: 1 for n in NAMES},
        "active": {n: int(n in ACTIVE) for n in NAMES},
        "init_guess": {**TRUE, **START},
        "prior_dist": {n: PRIOR.get(n, (1e-32, 1e32)) for n in NAMES},
        "trial_move": {n: WIDTH for n in NAMES},
    }
    M = len(LENGTHS)
    sim_info = {"lengths": LENGTHS, "nx": [NX] * M,
                "meas_types": ["TRPL"] * M, "num_meas": M}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": SIGMA, "hard_bounds": 1}
    iniPar = np.array([[f, a, 1] for f, a in FLU])
    e_data = ([t] * M, vals, [np.full(NT, UNC)] * M)
    plan = build_likelihood_plan(sim_info, param_info, mcmc, e_data, iniPar,
                                 hmax=hmax, align_outputs=False,
                                 refactor_every=refactor)
    mp = build_move_plan(param_info, mcmc)
    base_move = np.array([WIDTH if n in ACTIVE else 0.0 for n in NAMES])

    C = 64  # chunk: one batched (C x M) solve per init_ll call
    # inline escalation = production semantics (see run_tpu_mh)
    kern = build_mh_kernel(plan, mp, np.ones(C), base_move, temper_freq=10,
                           do_tempering=False, window=1,
                           dtype=jnp.float32, escalate="inline")
    ll_t = np.empty(S)
    full = np.array([TRUE[n] for n in NAMES])
    for c0 in range(0, S, C):
        c1 = min(c0 + C, S)
        block = np.tile(full, (C, 1))
        for j, k in enumerate(ACTIVE):
            block[:c1 - c0, NAMES.index(k)] = chosen[k][c0:c1]
        mat = np.asarray(kern.init_ll(jnp.asarray(block, jnp.float32)))
        ll_t[c0:c1] = np.diag(mat)[:c1 - c0]

    d = ll_t - ll_o
    fin = np.isfinite(d)
    ad = np.abs(d[fin])
    q = np.percentile(ad, [50, 90, 99, 100])
    lines = [
        f"# Log-likelihood agreement — {os.path.splitext(outname)[0]}",
        "",
        f"Pointwise |ll_tpu - ll_oracle| at {S} posterior-typical states",
        f"(thinned from the cached {warm_n}-iter uniform and {ridge_n}-iter"
        " ridge oracle chains"
        + (f" and the cached {tpu_n}-iter tpu chains" if tpu_n else ""),
        "post-burn — i.e. everywhere EITHER posterior walks, including"
        " ridge corners",
        "only one of the samplers visited). tpu side = the production"
        " compiled kernel",
        f"(fast mode, hmax={hmax:g}, chord refactor_every={refactor},"
        " float32); oracle side =",
        "float64 LSODA reference math. Unlike the mean-level z-test this"
        " has NO Monte-Carlo",
        "mixing error: it bounds the stationary-density ratio pointwise"
        " on the typical set",
        "(sup |dll| = eps implies the posterior densities agree within"
        " e^(2 eps) there).",
        "",
        "| |dll| median | p90 | p99 | max | ll scale (median |ll|) |",
        "|---|---|---|---|---|",
        f"| {q[0]:.3f} | {q[1]:.3f} | {q[2]:.3f} | {q[3]:.3f} | "
        f"{np.median(np.abs(ll_o[fin])):.0f} |",
        "",
        f"{int(fin.sum())}/{S} states finite in both"
        f" ({int((~fin).sum())} -inf/diverged mismatches).",
        f"Tail: {int((ad > 1).sum())}/{S} states exceed |dll| 1, "
        f"{int((ad > 20).sum())}/{S} exceed 20"
        + (f"; of the >1 tail, {int((d[fin] < -1).sum())}"
           f"/{int((ad > 1).sum())} SUPPRESS density (ll_tpu < ll_oracle), "
           "thinning the tpu walk there rather than attracting it"
           if int((ad > 1).sum()) else "") + ".",
        "Solver-failure handling: the dynamic Newton-convergence predicate"
        " + escalation ladder",
        "(docs/TPU_NOTES.md rounds 7-8) — flagged rows re-solve at"
        " h4/refine2/chord-free inline.",
        "",
        "Reproduce: `python scripts/posterior_compare.py "
        f"{ridge_n} {tpu_n} {hmax:g} {outname} --preset {PRESET} "
        f"--refactor {refactor} --ridge {warm_n} --ll-check {n_states}`.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", outname)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; |dll| median {q[0]:.3f} max {q[3]:.3f}")


def run_gold_check(t, vals, n_iters, hmax, refactor, outname, n_chains=32):
    """Mean-level agreement between the production FAST tpu sampler and a
    GOLD tpu sampler (hmax=min(hmax,4), refine=2, chord-free — the
    escalation-ladder target config, which matches the f64 LSODA oracle
    pointwise to <0.04 everywhere measured, docs/LL_AGREEMENT_r05.md).

    Rationale: the oracle-vs-tpu z-test is noise-floored by the serial
    CPU oracle's mixing (Sf/Sb ESS ~ 10-15 even under the ridge
    proposal). Both sides here run on the accelerator, so chain count and
    length are cheap: at n_chains=32 the per-parameter ESS is an order of
    magnitude higher, and any fast-mode bias that the pointwise ll-check
    bounds would show up as a mean shift against gold with tight MC
    error. Gold's own fidelity to the reference math is established
    separately (ll-check + LL_AGREEMENT artifacts), so fast==gold at high
    ESS + gold==oracle pointwise closes the chain."""
    fast, acc_f = _cached_tpu_mh(t, vals, n_iters, hmax, refactor,
                                 n_chains=n_chains)
    gold, acc_g = _cached_tpu_mh(t, vals, n_iters, min(hmax, 4.0), 1,
                                 refine=2, n_chains=n_chains)
    burn = n_iters // 3
    lines = [
        f"# Fast-vs-gold posterior agreement — {os.path.splitext(outname)[0]}",
        "",
        "Both samplers are this framework's compiled kernel on the same"
        f" dataset ({len(LENGTHS)} TRPL",
        f"curves, nx={NX}, preset {PRESET}), {n_chains} untempered chains"
        f" x {n_iters} iterations, burn-in {burn}:",
        "",
        f"* **fast** — production mode (hmax={hmax:g}, chord "
        f"refactor_every={refactor}), acceptance {acc_f:.2f}.",
        f"* **gold** — escalation-target mode (hmax={min(hmax, 4.0):g}, "
        f"refine=2, chord-free), acceptance {acc_g:.2f};",
        "  matches the f64 LSODA reference math pointwise to <0.04"
        " (docs/LL_AGREEMENT artifacts),",
        "  so fast==gold here + gold==oracle pointwise bounds the"
        " fast-mode posterior bias without",
        "  the CPU oracle's ESS noise floor.",
        "",
        "| param | truth | gold mean +/- sigma (ESS) | "
        "fast mean +/- sigma (ESS) | |z| | |z_mc| |",
        "|---|---|---|---|---|---|",
    ]
    worst = 0.0
    worst_mc = 0.0
    for p in ACTIVE:
        sg = gold[p][burn:]
        sf = fast[p][burn:]
        lg, lf = np.log10(sg.ravel()), np.log10(sf.ravel())
        mg, s_g = lg.mean(), lg.std()
        mf, s_f = lf.mean(), lf.std()
        essg, essf = ess_log10(sg), ess_log10(sf)
        z = abs(mg - mf) / np.hypot(s_g, s_f)
        z_mc = abs(mg - mf) / np.sqrt(
            s_g ** 2 + s_f ** 2 + s_g ** 2 / essg + s_f ** 2 / essf)
        worst, worst_mc = max(worst, z), max(worst_mc, z_mc)
        lines.append(
            f"| {p} | {TRUE[p]:g} | 10^({mg:.4f} +/- {s_g:.4f}) "
            f"({essg:.0f}) | 10^({mf:.4f} +/- {s_f:.4f}) ({essf:.0f}) "
            f"| {z:.2f} | {z_mc:.2f} |")
    lines += [
        "",
        f"Largest |z|: **{worst:.2f}**; largest MC-error-aware |z_mc|: "
        f"**{worst_mc:.2f}** — the fast mode's",
        "posterior means agree with gold within "
        + ("their posterior uncertainty." if worst < 1 else
           "threshold EXCEEDED."),
        "",
        "Reproduce: `python scripts/posterior_compare.py "
        f"0 {n_iters} {hmax:g} {outname} --preset {PRESET} "
        f"--refactor {refactor} --gold-check {n_chains}`.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", outname)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; worst |z| {worst:.2f} worst |z_mc| {worst_mc:.2f}")


def _flagged_fraction(t, vals, samples, burn, hmax, refactor,
                      newton_plateau=None, n_states=192):
    """Fraction of posterior-typical states (thinned post-burn from
    ``samples``) whose forward solve trips the Newton-divergence
    predicate BEFORE any escalation (escalate="off" eval) under the
    given solver config — the np-check escalation audit."""
    import jax.numpy as jnp

    from metrotrpl_tpu.inference.likelihood import (
        build_likelihood_plan,
        make_eval_logll,
    )

    param_info = {
        "names": NAMES,
        "unit_conversions": UC,
        "do_log": {n: 1 for n in NAMES},
        "active": {n: int(n in ACTIVE) for n in NAMES},
        "init_guess": {**TRUE, **START},
        "prior_dist": {n: PRIOR.get(n, (1e-32, 1e32)) for n in NAMES},
        "trial_move": {n: WIDTH for n in NAMES},
    }
    M = len(LENGTHS)
    sim_info = {"lengths": LENGTHS, "nx": [NX] * M,
                "meas_types": ["TRPL"] * M, "num_meas": M}
    mcmc = {"ini_mode": "fluence", "model": "std", "log_y": 1,
            "model_uncertainty": SIGMA, "hard_bounds": 1}
    iniPar = np.array([[f, a, 1] for f, a in FLU])
    e_data = ([t] * M, vals, [np.full(NT, UNC)] * M)
    plan = build_likelihood_plan(sim_info, param_info, mcmc, e_data, iniPar,
                                 hmax=hmax, align_outputs=False,
                                 refactor_every=refactor,
                                 newton_plateau=newton_plateau)
    ev = make_eval_logll(plan, dtype=jnp.float32, escalate="off")

    flat = {k: np.asarray(samples[k])[burn:].ravel() for k in ACTIVE}
    n_avail = len(flat[ACTIVE[0]])
    idx = np.linspace(0, n_avail - 1, n_states).astype(int)
    full = np.array([TRUE[n] for n in NAMES])
    C = 64
    flagged = 0
    for c0 in range(0, n_states, C):
        c1 = min(c0 + C, n_states)
        block = np.tile(full, (c1 - c0, 1))
        for k in ACTIVE:
            block[:, NAMES.index(k)] = flat[k][idx[c0:c1]]
        out = ev(jnp.asarray(block, jnp.float32), jnp.asarray([1.0]))
        flagged += int((np.asarray(out["fail_states"]) > 0).sum())
    return flagged / n_states


def run_np_check(t, vals, n_iters, hmax, refactor, outname, n_chains=32):
    """Mean-level agreement between the production fast sampler and the
    SAME sampler with newton_plateau=1 (single modified-Newton correction
    per implicit stage on the constant-dt plateau — the dependency-depth
    lever measured at +20% aggregate walker-steps/s on the flagship
    workload, scripts/probe_r7_newton.py). Both sides run on the
    accelerator at high ESS; production fast is itself validated against
    gold (run_gold_check) and the f64 oracle (the r05/r06 artifacts), so
    np1==fast at tight MC error extends that chain to newton_plateau=1."""
    base, acc_b = _cached_tpu_mh(t, vals, n_iters, hmax, refactor,
                                 n_chains=n_chains)
    np1, acc_n = _cached_tpu_mh(t, vals, n_iters, hmax, refactor,
                                n_chains=n_chains, newton_plateau=1)
    burn = n_iters // 3
    # Escalation-rate audit (ADVICE r3): if np1's plateau residual trips
    # the Newton predicate on posterior-typical states, the np1 chain
    # would mostly be sampling ESCALATED full-Newton solves — certifying
    # np1==fast while validating the wrong config, and the claimed
    # speedup would not hold. Measure the pre-repair flag rate of each
    # config on its own post-burn states with an escalate-free eval.
    esc_frac = {}
    for tag, samples, np_cfg in (("production", base, None), ("np1", np1, 1)):
        esc_frac[tag] = _flagged_fraction(t, vals, samples, burn, hmax,
                                          refactor, newton_plateau=np_cfg)
    lines = [
        f"# newton_plateau=1 posterior agreement — "
        f"{os.path.splitext(outname)[0]}",
        "",
        "Both samplers are this framework's compiled kernel on the same"
        f" dataset ({len(LENGTHS)} TRPL",
        f"curves, nx={NX}, preset {PRESET}), {n_chains} untempered chains"
        f" x {n_iters} iterations, burn-in {burn}:",
        "",
        f"* **production** — fast mode (hmax={hmax:g}, chord "
        f"refactor_every={refactor}, 2 Newton), acceptance {acc_b:.2f};",
        "  validated against gold and the f64 LSODA oracle"
        " (docs/POSTERIOR_r05_full.md, docs/POSTERIOR_r06_gold.md).",
        f"* **np1** — same config with newton_plateau=1 (one Newton"
        f" correction per plateau stage), acceptance {acc_n:.2f}.",
        "",
        "| param | truth | production mean +/- sigma (ESS) | "
        "np1 mean +/- sigma (ESS) | |z| | |z_mc| |",
        "|---|---|---|---|---|---|",
    ]
    worst = 0.0
    worst_mc = 0.0
    for p in ACTIVE:
        sb = base[p][burn:]
        sn = np1[p][burn:]
        lb, ln = np.log10(sb.ravel()), np.log10(sn.ravel())
        mb, s_b = lb.mean(), lb.std()
        mn, s_n = ln.mean(), ln.std()
        essb, essn = ess_log10(sb), ess_log10(sn)
        z = abs(mb - mn) / max(np.hypot(s_b, s_n), 1e-12)
        z_mc = abs(mb - mn) / max(np.sqrt(
            s_b ** 2 + s_n ** 2 + s_b ** 2 / essb + s_n ** 2 / essn), 1e-12)
        worst, worst_mc = max(worst, z), max(worst_mc, z_mc)
        lines.append(
            f"| {p} | {TRUE[p]:g} | 10^({mb:.4f} +/- {s_b:.4f}) "
            f"({essb:.0f}) | 10^({mn:.4f} +/- {s_n:.4f}) ({essn:.0f}) "
            f"| {z:.2f} | {z_mc:.2f} |")
    esc_ok = esc_frac["np1"] <= max(2 * esc_frac["production"], 0.05)
    lines += [
        "",
        f"Largest |z|: **{worst:.2f}**; largest MC-error-aware |z_mc|: "
        f"**{worst_mc:.2f}** — newton_plateau=1's",
        "posterior means agree with the production config within "
        + ("their posterior uncertainty." if worst < 1 else
           "threshold EXCEEDED."),
        "",
        "Escalation audit (each config's own post-burn states, 192 "
        "thinned, escalate-free eval):",
        f"Newton-predicate flag rate production "
        f"{esc_frac['production']:.3f}, np1 {esc_frac['np1']:.3f} — "
        + ("np1 samples its OWN solver config, not escalated "
           "full-Newton re-solves (PASS)." if esc_ok else
           "WARNING: np1 flags materially more than production — the "
           "agreement above partly validates ESCALATED solves, and the "
           "np1 speedup will not hold at this rate."),
        "",
        "Reproduce: `python scripts/posterior_compare.py "
        f"0 {n_iters} {hmax:g} {outname} --preset {PRESET} "
        f"--refactor {refactor} --np-check {n_chains}`.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", outname)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; worst |z| {worst:.2f} worst |z_mc| {worst_mc:.2f}")


def ess_log10(x):
    """Effective sample size of a (possibly multi-chain) sample set in
    log10 space: per-chain integrated-autocorrelation-time ESS (initial
    positive sequence truncated at acf < 0.05), summed over independent
    chains. x : (n,) one chain or (n, K) K chains."""
    x = np.log10(np.atleast_2d(x.T if x.ndim > 1 else x[None, :]))
    total = 0.0
    for row in x:
        r = row - row.mean()
        n = len(r)
        v = r.var()
        if v == 0:
            continue
        acf = np.correlate(r, r, "full")[n - 1:] / (
            np.arange(n, 0, -1) * v)
        tau = 1.0
        for k in range(1, n // 2):
            if acf[k] < 0.05:
                break
            tau += 2 * acf[k]
        total += n / tau
    return max(total, 1.0)


def main():
    oracle_only = "--oracle-only" in sys.argv[1:]
    tpu_only = "--tpu-only" in sys.argv[1:]
    argv = [a for a in sys.argv[1:]
            if a not in ("--oracle-only", "--tpu-only")]
    if "--preset" in argv:
        i = argv.index("--preset")
        apply_preset(argv[i + 1])
        del argv[i:i + 2]
    n_oracle = int(argv[0]) if len(argv) > 0 else 2500
    n_tpu = int(argv[1]) if len(argv) > 1 else 20000
    hmax = float(argv[2]) if len(argv) > 2 else 16.0
    refactor = 1
    if "--refactor" in argv:
        i = argv.index("--refactor")
        refactor = int(argv[i + 1])
        del argv[i:i + 2]
    ridge_warm = 0
    if "--ridge" in argv:
        # --ridge N: phase-2 ridge-proposal oracle with covariance from
        # the cached N-iteration uniform warmup (_cached_oracle_ridge)
        i = argv.index("--ridge")
        ridge_warm = int(argv[i + 1])
        del argv[i:i + 2]
    tpu_ridge = 0
    if "--tpu-ridge" in argv:
        # --tpu-ridge N: ridge-proposal oracle with covariance from the
        # cached N-iteration TPU run (_cached_oracle_ridge_tpu — the
        # flagship-preset oracle; proposal choice affects mixing only)
        i = argv.index("--tpu-ridge")
        tpu_ridge = int(argv[i + 1])
        del argv[i:i + 2]
    ridge_scale = 1.0
    if "--ridge-scale" in argv:
        # --ridge-scale S: shrink the tpu-cov proposal by S (acceptance
        # tuning; stationary distribution unchanged)
        i = argv.index("--ridge-scale")
        ridge_scale = float(argv[i + 1])
        del argv[i:i + 2]
    n_chains = 8
    if "--chains" in argv:
        # --chains K: untempered tpu chain count (default 8; the
        # flagship preset uses 32 for an order-of-magnitude ESS gain).
        # With --temper, K = number of independent tempered ensembles.
        i = argv.index("--chains")
        n_chains = int(argv[i + 1])
        del argv[i:i + 2]
    temper = 0
    if "--temper" in argv:
        # --temper Kt: production tempered sampler with a 2^0..2^(Kt-1)
        # ladder; only cold (T=1) chains enter the comparison
        i = argv.index("--temper")
        temper = int(argv[i + 1])
        del argv[i:i + 2]
    gold_check = 0
    if "--gold-check" in argv:
        # --gold-check K: fast-vs-gold tpu z-test with K chains per side
        # (run_gold_check); n_tpu sets the per-chain iteration count
        i = argv.index("--gold-check")
        gold_check = int(argv[i + 1])
        del argv[i:i + 2]
    np_check = 0
    if "--np-check" in argv:
        # --np-check N: production fast vs fast-with-newton_plateau=1 at
        # N chains each (run_np_check); n_tpu sets the iteration count
        i = argv.index("--np-check")
        np_check = int(argv[i + 1])
        del argv[i:i + 2]
    ll_check = 0
    if "--ll-check" in argv:
        # --ll-check N: pointwise log-likelihood agreement at N
        # posterior-typical states from the cached oracle chains
        # (run_ll_check) instead of the mean-level z-test
        i = argv.index("--ll-check")
        ll_check = int(argv[i + 1])
        del argv[i:i + 2]
    outname = argv[3] if len(argv) > 3 else "POSTERIOR_r02.md"
    t, vals = make_dataset()

    if gold_check:
        run_gold_check(t, vals, n_tpu, hmax, refactor, outname,
                       n_chains=gold_check)
        return
    if np_check:
        run_np_check(t, vals, n_tpu, hmax, refactor, outname,
                     n_chains=np_check)
        return
    if ll_check:
        run_ll_check(t, vals, ll_check, hmax, refactor,
                     warm_n=(ridge_warm or 16000), ridge_n=n_oracle,
                     outname=outname, tpu_n=n_tpu)
        return

    def oracle_half():
        if tpu_ridge:
            return _cached_oracle_ridge_tpu(t, vals, n_oracle, tpu_ridge,
                                            hmax, refactor,
                                            n_chains=n_chains,
                                            scale=ridge_scale)
        if ridge_warm:
            return _cached_oracle_ridge(t, vals, n_oracle, ridge_warm)
        return _cached_oracle_mh(t, vals, n_oracle)

    if oracle_only:
        # warm the oracle cache without touching the accelerator
        oracle_half()
        return
    if tpu_only:
        # warm the tpu cache without touching the host-core oracle
        _cached_tpu_mh(t, vals, n_tpu, hmax, refactor, n_chains=n_chains,
                       temper=temper)
        return
    print("running tpu MH...", flush=True)
    tpu_samples, tpu_acc = _cached_tpu_mh(t, vals, n_tpu, hmax, refactor,
                                          n_chains=n_chains, temper=temper)
    print("running oracle MH...", flush=True)
    oracle_samples, oracle_acc = oracle_half()

    burn_o = n_oracle // 3
    burn_t = n_tpu // 3
    lines = [
        f"# Posterior agreement — {os.path.splitext(outname)[0]}",
        "",
        "Cross-implementation posterior comparison on a shared noisy",
        f"synthetic dataset ({len(LENGTHS)} TRPL curves, nx={NX}, nt={NT}, "
        f"t<={T_END:.0f} ns,",
        f"noise sigma={UNC} in log10, model uncertainty {SIGMA}). Active:",
        f"{', '.join(ACTIVE)}; starts off-truth at "
        f"{ {k: START[k] for k in ACTIVE} }.",
        "",
        "* **oracle MH** — plain numpy/scipy serial Metropolis with LSODA",
        f"  forward solves (reference math), {n_oracle} iterations, "
        f"burn-in {burn_o},",
        f"  acceptance {oracle_acc:.2f}."
        + (f" Ridge proposal: fixed Gaussian covariance estimated from a"
           f" {ridge_warm}-iteration uniform-proposal warmup chain"
           " (same posterior, faster mixing along the degenerate"
           " Sf/Sb, Cn/Cp, mu_n/mu_p directions)." if ridge_warm else "")
        + (f" Ridge proposal: FIXED symmetric Gaussian with covariance"
           f" estimated from the cached {tpu_ridge}-iteration tpu run,"
           " started at the tpu posterior mean — a fixed symmetric"
           " proposal cannot change the chain's stationary distribution"
           " (the exact reference-math posterior), only its mixing rate,"
           " and the start point is burned many ESS over."
           if tpu_ridge else ""),
        "* **tpu MH** — this framework's compiled kernel (fast solver",
        f"  mode, hmax={hmax:g}"
        + (f", chord refactor_every={refactor}" if refactor > 1
           else "")
        + (f"), {n_chains} independent PRODUCTION-tempered ensembles "
           f"(ladder 2^0..2^{temper - 1}, swap/10; cold T=1 chains "
           f"compared) x {n_tpu} " if temper
           else f"), {n_chains} untempered chains x {n_tpu} ")
        + "iterations, burn-in "
        f"{burn_t},",
        f"  acceptance {tpu_acc:.2f}"
        + (" (cold chains)." if temper else "."),
        "",
        "| param | truth | oracle mean +/- sigma (ESS) | "
        "tpu mean +/- sigma (ESS) | |z| | |z_mc| |",
        "|---|---|---|---|---|---|",
    ]
    worst = 0.0
    worst_mc = 0.0
    # identifiable combinations: multi-thickness/fluence TRPL constrains
    # these tightly while the individual splits (mu_n|mu_p, Sf|Sb,
    # Cn|Cp) are ridge-degenerate — both samplers mix orders of
    # magnitude faster along them, so their z rows separate "the
    # implementations disagree" from "a finite chain wobbles along the
    # ridge" (the GUI's secondary-parameters view exists for the same
    # physics, reference GUI/secondary_parameters.py)
    derived = {}
    if {"mu_n", "mu_p"} <= set(ACTIVE):
        derived["mu_ambi"] = lambda s: (2 * s["mu_n"] * s["mu_p"]
                                        / (s["mu_n"] + s["mu_p"]))
    if {"Sf", "Sb"} <= set(ACTIVE):
        derived["Sf+Sb"] = lambda s: s["Sf"] + s["Sb"]
    if {"Cn", "Cp"} <= set(ACTIVE):
        derived["Cn+Cp"] = lambda s: s["Cn"] + s["Cp"]
    rows = ([(p, None) for p in ACTIVE]
            + [(name, fn) for name, fn in derived.items()])
    for p, fn in rows:
        if fn is None:
            so = oracle_samples[p][burn_o:]
            st = tpu_samples[p][burn_t:]
            true_p = TRUE[p]
        else:
            so = fn({k: oracle_samples[k][burn_o:] for k in ACTIVE})
            st = fn({k: tpu_samples[k][burn_t:] for k in ACTIVE})
            true_p = float(fn({k: np.asarray(TRUE[k]) for k in ACTIVE}))
        lo = np.log10(so.ravel())
        lt = np.log10(st.ravel())
        mo, s_o = lo.mean(), lo.std()
        mt, s_t = lt.mean(), lt.std()
        # MC-error-aware denominator: each sampler's MEAN estimate
        # carries standard error sigma/sqrt(ESS) (serial chains mix
        # slowly: ESS << n). Raw z stays the headline; z_mc separates
        # "the samplers disagree" from "a finite chain wobbles".
        e_o, e_t = ess_log10(so), ess_log10(st)
        denom = max(np.hypot(s_o, s_t), 1e-12)
        denom_mc = max(np.sqrt(s_o ** 2 + s_t ** 2 + s_o ** 2 / e_o
                               + s_t ** 2 / e_t), 1e-12)
        z = abs(mo - mt) / denom
        z_mc = abs(mo - mt) / denom_mc
        worst = max(worst, z)
        worst_mc = max(worst_mc, z_mc)
        lines.append(
            f"| {p} | {true_p:.4g} | 10^({mo:.4f} +/- {s_o:.4f}) "
            f"({e_o:.0f}) | 10^({mt:.4f} +/- {s_t:.4f}) ({e_t:.0f}) | "
            f"{z:.2f} | {z_mc:.2f} |")
    lines += [
        "",
        f"Largest |z| (mean difference / combined posterior sigma): "
        f"**{worst:.2f}**; largest",
        f"MC-error-aware |z_mc| (denominator also carries each mean's "
        f"standard error sigma/sqrt(ESS)): **{worst_mc:.2f}** — the",
        "samplers agree within their posterior uncertainty"
        + (" (PASS, z < 1)." if worst < 1 else
           (" once finite-chain Monte-Carlo error is accounted for "
            "(PASS, z_mc < 1; raw z threshold EXCEEDED)."
            if worst_mc < 1 else " threshold EXCEEDED.")),
        "",
        "Reproduce: `python scripts/posterior_compare.py "
        f"{n_oracle} {n_tpu} {hmax:g} {outname}"
        + (f" --preset {PRESET}" if PRESET != "3p" else "")
        + (f" --refactor {refactor}" if refactor > 1 else "")
        + (f" --ridge {ridge_warm}" if ridge_warm else "")
        + (f" --tpu-ridge {tpu_ridge}" if tpu_ridge else "")
        + (f" --chains {n_chains}" if n_chains != 8 else "")
        + (f" --temper {temper}" if temper else "") + "`.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", outname)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; worst z = {worst:.2f}")


if __name__ == "__main__":
    main()
