"""Tempered Gaussian log-likelihood of parameter states.

TPU re-architecture of the reference's per-measurement Python loop
(reference trial_move_evaluation.py:9-166): all (chains x measurements)
forward simulations run as ONE batched implicit solve, the IRF convolution is
one grouped XLA convolution, and every dynamic-length trim of the reference
(post_conv_trim, negative-count tolerance, force_min_y) becomes a masked
fixed-shape op. Failures (NaN, depleted carriers, too many negative values)
yield -inf log-likelihood exactly like the reference's exception paths.

The evaluation returns the log-likelihood of every chain at EVERY ensemble
temperature (a (chains, temps) matrix). This replaces the reference's
``ll_funcs`` closures (trial_move_evaluation.py:150-156): tempering swaps
need ll at two temperatures, and the matrix costs nothing next to the PDE
solves.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from metrotrpl_tpu.constants import NEGATIVE_FRAC_TOL

#: Newton-convergence failure threshold for the dynamic solver-failure
#: predicate: a solve whose max |last Newton update| (in the O(1)-rescaled
#: state, over the row's real output window) exceeds this is treated as
#: diverged even when its output stays finite and above the underflow
#: clamp. The healthy-residual floor is GRID-DEPENDENT (stiffer fine
#: grids run modified Newton with larger converged updates), so the
#: default is nx-aware (resolve via newton_div_tol_default); this module
#: constant is the coarse-grid value. Round-10 calibration
#: (scripts/probe_r12_ladder.py, docs/TPU_NOTES.md round-10, both with
#: trust-region-damped Newton — genuine divergences pin at the
#: solver.sdirk.NEWTON_DAMP cap 2.0 and always flag):
#: * nx<=64 (calibrated at 32): tol 0.1 — +/-0.3-dex ball FP 0/28
#:   (the round-8 value 1e-2 flagged 15/28 healthy ball rows, which made
#:   tempered hot chains fire the escalated re-solve ~every iteration
#:   and cost 14x production throughput, BENCH r4); catches every
#:   typical-zone partial collapse (broken-at-typical min resid 0.159);
#:   missed rows sit at ll <= ~-1700, unreachable at any ladder
#:   temperature, with |dll| << |ll| either way.
#: * nx>=96 (calibrated at 128): tol 1.0 — the healthy floor at walked
#:   tempered states reaches 0.57 (those rows are ACCURATE: |dll| vs
#:   gold <= 0.055) so 0.1 flags chronically, while every observed
#:   nx=128 collapse either NaNs/clamps (static predicate) or pins at
#:   the 2.0 damping cap. No finite sub-cap broken row was observed at
#:   nx=128 (scripts/probe_r13_hotflags.py).
NEWTON_DIV_TOL = 0.1


def newton_div_tol_default(nx_max):
    """nx-aware default for the Newton-divergence threshold (see
    NEWTON_DIV_TOL calibration note). Round-5 recalibration at nx>=96
    (scripts/probe_r16_stiffmap.py, 104 prior-box + ridge states x 6
    meas vs emulated-f64 reference): 0.5 + the mu escalation trigger
    (ESCALATE_MU_MODEL) has ZERO cold-relevant false negatives, where
    the round-4 value 1.0 alone missed 15 decades-wrong sub-cap rows."""
    return 0.5 if nx_max >= 96 else (NEWTON_DIV_TOL if nx_max <= 64
                                     else 0.3)


#: Mobility escalation trigger for fine grids (MODEL units, nm^2/(V ns);
#: = 40 cm^2/(V s)). probe_r14/r16 root cause: at nx=128 the f32 fast
#: solve of thin-sample/high-fluence rows at high mobility can be
#: decades-wrong with resid BELOW every usable tolerance (sub-cap false
#: negatives start at mu_max ~ 50 cm^2/Vs; margin -> 40), so rows whose
#: state sits in the high-mobility region are repaired by the f64 rung
#: regardless of their residual. Only active when the escalation plan is
#: the f64-emulated rung (an f32 rung cannot fix what it flags).
ESCALATE_MU_MODEL = 40.0 * 1e5

#: Escalation GATE: a Newton-flagged row is repaired (escalated re-solve)
#: only when its fast solve's mean squared log10 distance to the data is
#: below this [decades^2] — i.e. the state is anywhere near
#: accept/swap-relevance. Flagged rows with hopeless fits keep their
#: finite fast-mode ll (measured suppress-only, docs/LL_AGREEMENT_r05.md)
#: instead of firing the ~6x escalated solve: tempered hot chains live
#: exactly in that far-off regime and otherwise trip the repair on
#: ~every iteration (BENCH r4: 2880 -> 210..410 walker-steps/s). The
#: gate is a deterministic function of the state, so every chain's
#: target density stays well-defined and consistently used — the cold
#: chain's target is exact wherever it can reach: at cut=0.25 the gate
#: only disables repair for states whose T=1 log-likelihood is >=
#: 0.25 * n_pts / (sigma^2 + 2 u^2) below a perfect fit (tens of
#: thousands of log-units for every shipped workload), while the
#: posterior-typical set sits at score ~ u^2 ~ 1e-3. Static failures
#: (non-finite / underflow-clamped output) still concede -inf outside
#: the gate — there is no usable ll to keep.
ESCALATE_GATE_SCORE = 0.25
from metrotrpl_tpu.ops.convolve import convolve_moments
from metrotrpl_tpu.ops.interp import interp1d
from metrotrpl_tpu.physics.models import beer_lambert
from metrotrpl_tpu.solver.forward import ForwardPlan, make_forward_plan, solve_forward_batch


def u_potential(x):
    """Toy multi-well 1D potential for the 'pa' measurement type
    (reference utils.py:41-57)."""
    x = jnp.asarray(x)
    base = 1 + jnp.sin(2 * jnp.pi * x)
    u = jnp.where(x < -1.25, 1 * base,
        jnp.where(x < -0.25, 2 * base,
        jnp.where(x < 0.75, 3 * base,
        jnp.where(x < 1.75, 4 * base, 5 * base))))
    return jnp.where((x < -2) | (x > 2), jnp.inf, u)


def search_c_grps(c_grps, i):
    """First member of the constraint group containing i, else i
    (reference utils.py:5-14)."""
    for grp in c_grps or []:
        if i in grp:
            return grp[0]
    return i


class LikelihoodPlan(NamedTuple):
    """Static data for batched likelihood evaluation (host numpy)."""
    kind: str                   # "pde" | "pa"
    # forward-solve groups: measurements sharing an nx batch together;
    # tuple of (measurement-index array, ForwardPlan)
    fwd: Optional[tuple]
    n_meas: int
    n_params: int
    # parameter machinery
    param_names: tuple
    units: np.ndarray           # (P,)
    param_idx: dict             # name -> index
    # experiment data (M, nt_exp), padded
    exp_times: np.ndarray
    exp_vals: np.ndarray
    exp_uncs: np.ndarray
    exp_mask: np.ndarray
    # per-measurement wiring
    sigma: np.ndarray           # (M,) model uncertainty
    scale_idx: np.ndarray       # (M,) state index of _s factor, -1 if none
    fluence_idx: np.ndarray     # (M,) state index of _f factor, -1 if none
    absp_idx: np.ndarray        # (M,) state index of _a factor, -1 if none
    # initial conditions
    ini_mode: str               # "density" | "fluence"
    init_profiles: np.ndarray   # density mode: (M, nx); fluence mode: (M, 3)
    # IRF machinery
    has_irf: np.ndarray         # (M,) bool
    irf_tables: np.ndarray      # (M, nk_irf, 3)
    res_t: np.ndarray           # (M, R) half-step resample times
    n_conv: np.ndarray          # (M,) actual convolved-point counts
    force_min_y: bool
    log_y: bool
    # optional NN-surrogate forward model (reference forward_solver.py:205-222)
    nn: object = None
    thickness: np.ndarray = None   # (M,) [nm], NN feature
    #: Newton-convergence failure threshold (see NEWTON_DIV_TOL for the
    #: calibration); configurable per plan/config since the O(1)-rescaled
    #: residual scale is workload-dependent (VERDICT r3 weak #4).
    #: None (the default) = resolve PER nx-GROUP at evaluation time via
    #: :func:`newton_div_tol_default` — the healthy-residual floor is
    #: grid-dependent, so a mixed-nx config needs each group judged at its
    #: own grid's calibrated threshold (ADVICE r4 #2: resolving once from
    #: max(nx) left coarse groups at the fine-grid tolerance, where
    #: typical-zone partial collapses at resid >= 0.159 never flag)
    newton_div_tol: Optional[float] = None
    #: escalation-gate fit-distance cut (see ESCALATE_GATE_SCORE)
    esc_gate_score: float = ESCALATE_GATE_SCORE


def _resolve_newton_div_tol(v):
    """Normalize a user-supplied newton_div_tol (None = per-group default).

    The trust-region damping caps every reported Newton residual at
    ``solver.sdirk.NEWTON_DAMP``, so a tolerance at or above the cap can
    never flag (``resid < tol`` is always true for finite resid) and would
    silently disable the dynamic failure predicate (ADVICE r4 #3). Config
    files reject such values in validation (config/validate.py); direct
    API callers get the same clamp here with a warning.
    """
    if v is None:
        return None
    from metrotrpl_tpu.solver.sdirk import NEWTON_DAMP
    v = float(v)
    if np.isinf(v):
        # explicit inf = intentional "disable the predicate" (probe /
        # measurement use); only finite in-between values are the
        # silent-misconfiguration trap the clamp guards against
        return v
    if NEWTON_DAMP is not None and v >= NEWTON_DAMP:
        import logging
        clamped = 0.5 * float(NEWTON_DAMP)
        logging.getLogger("MCMC").warning(
            "newton_div_tol=%g >= the Newton damping cap %g would never "
            "flag a diverged solve (damped residuals pin at the cap); "
            "clamping to %g.", v, float(NEWTON_DAMP), clamped)
        return clamped
    return v


def _fittable_index_map(spec, n_meas, param_idx, base):
    """Per-measurement state index of the shared fittable parameter."""
    out = np.full(n_meas, -1, dtype=np.int64)
    if spec is None:
        return out
    _, inds, c_grps, _ = spec
    for i in inds:
        name = f"{base}{search_c_grps(c_grps, int(i))}"
        out[int(i)] = param_idx[name]
    return out


def resolve_solver_mode(MCMC_fields, default_hmax, hmax=None,
                        align_outputs=None):
    """Shared `Solver name: sdirk` fast-mode policy for every inference
    mode (metro / dense sampler / MLE). Returns (hmax, align_outputs).

    sdirk = the TPU-native fast integration mode: solver steps decouple
    from the output times (log-space observable interpolation) and hmax
    bounds the step directly, defaulting to the validated 16. Any other
    solver name (solveivp/odeint) keeps reference semantics: output-
    aligned steps at the caller's reference-parity default — metro 4.0
    (reference sim_utils.py DEFAULT_HMAX), dense/MLE 1.0 (hard-coded
    Grid hmax=1 at Dense_Sample/dense_sampling.py:117,
    MLE/max_likelihood.py:39). Explicit caller values always win.
    """
    fast = (MCMC_fields.get("solver") or ("solveivp",))[0] == "sdirk"
    if align_outputs is None:
        align_outputs = not fast
    if hmax is None:
        hmax = MCMC_fields.get("hmax", 16.0 if fast else default_hmax)
    if hmax == 0:
        # the reference's odeint "no step limit" sentinel
        # (bayes_validate.py hmax=0): an adaptive integrator picks its own
        # steps, but a fixed-step scheme needs a finite bound — fall back
        # to the mode default rather than crash in grid planning.
        import logging
        logging.getLogger("MCMC").warning(
            "Solver hmax=0 (adaptive 'no step limit' sentinel) is not "
            "representable in the fixed-step scheme; using hmax=%s.",
            16.0 if fast else default_hmax)
        hmax = 16.0 if fast else default_hmax
    return hmax, align_outputs


def build_likelihood_plan(sim_info, param_info, MCMC_fields, e_data, iniPar,
                          irf_tables=None, hmax=None, scheme="sdirk3",
                          newton_iters=2, refine=1, escalate=True,
                          align_outputs=True, refactor_every=1,
                          h0=1e-3, growth=1.25, ramp_block=1,
                          newton_plateau=None, newton_div_tol=None):
    """Assemble the static likelihood plan from parsed config + data.

    sim_info : grid dict (lengths, nx, meas_types, num_meas)
    e_data : (times, vals, uncs) lists from get_data (log-transformed when
        MCMC_fields['log_y']).
    iniPar : (M, nx) density profiles or (M, <=3) fluence specs.
    irf_tables : dict wavelength -> (I_table, t_irf) from make_I_tables.
    """
    n_meas = sim_info["num_meas"]
    meas_types = sim_info["meas_types"]
    names = list(param_info["names"])
    n_params = len(names)
    param_idx = {n: i for i, n in enumerate(names)}
    units = np.array(
        [param_info["unit_conversions"].get(n, 1) for n in names], dtype=float)

    times, vals, uncs = e_data
    solver_spec = MCMC_fields.get("solver", ("solveivp",))
    if any(m == "pa" for m in meas_types):
        if not all(m == "pa" for m in meas_types):
            raise NotImplementedError("Mixed pa + PDE measurements unsupported")
        kind = "pa"
    elif solver_spec and solver_spec[0] == "NN":
        if any(m != "TRPL" for m in meas_types):
            raise NotImplementedError("NN surrogate supports TRPL only")
        kind = "nn"
    else:
        kind = "pde"

    nt_exp = max(len(t) for t in times)
    exp_times = np.zeros((n_meas, nt_exp))
    exp_vals = np.zeros((n_meas, nt_exp))
    exp_uncs = np.ones((n_meas, nt_exp))
    exp_mask = np.zeros((n_meas, nt_exp), dtype=bool)
    for m in range(n_meas):
        k = len(times[m])
        exp_times[m, :k] = times[m]
        # pad times monotonically so interp/searchsorted stay well-defined
        if k < nt_exp:
            last = times[m][-1] if k else 0.0
            exp_times[m, k:] = last + 1.0 + np.arange(nt_exp - k)
        exp_vals[m, :k] = vals[m]
        exp_uncs[m, :k] = uncs[m]
        exp_mask[m, :k] = True

    sigma_spec = MCMC_fields.get("model_uncertainty")
    if sigma_spec is None:
        # likel2move_ratio path (reference sim_utils.py:191-196)
        tm = param_info["trial_move"]
        base_move = max(
            tm[n] if param_info["active"][n] else 0 for n in names)
        l2v = MCMC_fields["likel2move_ratio"]
        if not isinstance(l2v, dict):  # validated scalar form
            l2v = {m: l2v for m in set(meas_types)}
        missing = set(meas_types) - set(l2v)
        if missing:
            raise ValueError(
                "likel2move_ratio missing measurement type(s) "
                f"{sorted(missing)}: provide one value per type in "
                f"{sorted(set(meas_types))}")
        sigma_spec = {m: base_move * l2v[m] for m in set(meas_types)}
    if isinstance(sigma_spec, dict):
        missing = set(meas_types) - set(sigma_spec)
        if missing:
            raise ValueError(
                "model_uncertainty missing measurement type(s) "
                f"{sorted(missing)}: provide one value per type in "
                f"{sorted(set(meas_types))}")
        sigma = np.array([sigma_spec[m] for m in meas_types], dtype=float)
    else:
        sigma = np.full(n_meas, float(sigma_spec))

    scale_idx = _fittable_index_map(
        MCMC_fields.get("scale_factor"), n_meas, param_idx, "_s")
    fluence_idx = _fittable_index_map(
        MCMC_fields.get("fittable_fluences"), n_meas, param_idx, "_f")
    absp_idx = _fittable_index_map(
        MCMC_fields.get("fittable_absps"), n_meas, param_idx, "_a")

    fwd = None
    has_irf = np.zeros(n_meas, dtype=bool)
    irf_mats = np.zeros((n_meas, 1, 3))
    res_t = np.zeros((n_meas, 3))
    n_conv = np.zeros(n_meas, dtype=np.int64)

    if kind == "pde":
        # group measurements by nx so each group batches with static shapes
        # (the reference allows per-measurement nx, MCMC_script_writer.py:48;
        # note density-mode initial profiles require a uniform nx — a ragged
        # CSV is unloadable in the reference too)
        nx_list = [int(n) for n in sim_info["nx"]]
        if MCMC_fields["ini_mode"] == "density" and len(set(nx_list)) > 1:
            raise NotImplementedError(
                "density-mode initial profiles require a uniform nx")
        hm = hmax if hmax is not None else MCMC_fields.get("hmax", 4.0)
        if hm == 0:  # odeint "no step limit" sentinel — see resolve_solver_mode
            hm = 4.0
        fwd = []
        for nx_val in sorted(set(nx_list)):
            idx = np.array([m for m in range(n_meas)
                            if nx_list[m] == nx_val])
            def _mk(r, chord=True, hm_x=None):
                return make_forward_plan(
                    [sim_info["lengths"][m] for m in idx],
                    [nx_val] * len(idx),
                    [meas_types[m] for m in idx],
                    [times[m] for m in idx],
                    hmax=(hm if hm_x is None else hm_x),
                    model=MCMC_fields["model"], scheme=scheme,
                    newton_iters=newton_iters, refine=r,
                    align_outputs=align_outputs,
                    refactor_every=(refactor_every if chord else 1),
                    h0=h0, growth=growth,
                    ramp_block=(ramp_block if chord else 1),
                    newton_plateau=(newton_plateau if chord else None))
            # escalation plan: retried only for rows whose base solve
            # fails (the reference's converge_simulation contract,
            # trial_move_evaluation.py:168-210). The retry drops the
            # WHOLE fast-mode envelope, not just the chord: measured on
            # the full-preset posterior typical set, the failing states
            # (moderate mu_n x high mu_p) collapse at hmax=48 under
            # EVERY Newton/refactor/refine variant, while hmax=4
            # chord-free reproduces the f64 oracle ll to 4 digits at
            # 15/16 of them (docs/LL_AGREEMENT_r05.md). Rung cost
            # matters in production: tempered hot chains fire it
            # persistently, so the rung is h<=4/chord-free at the BASE
            # refine (~6x a fast solve; round-10 repair quality at
            # flagged rows |dll| p50 0.056 / p90 0.24 vs gold —
            # scripts/probe_r12_ladder.py; the old refine-2x rung
            # (~12x) bought p50 0.056 -> 0.04-ish and 3/192 extra
            # rescues, at double the always-on burn-in cost).
            # rung hmax is nx-aware like the predicate default: at
            # nx>=96 the h16 chord-free rung matches gold to |dll| <=
            # 0.015 at walked tempered states (probe_r13) at ~2.6x a
            # fast solve instead of h4's ~7x — and tempered chains
            # legitimately CAMP on repair-needing states, so the rung
            # price is paid near-continuously (round-10); at coarse nx
            # the h16 rung repairs poorly (probe_r12) and h4 stays.
            esc_hm = min(hm, 4.0 if nx_val <= 64 else 16.0)
            # if the base plan is ALREADY the rung config (reference
            # mode), dropping the envelope changes nothing — refine 2x
            # so the retry is a genuinely different solve
            esc_refine = (refine if (hm > esc_hm or refactor_every > 1
                                     or ramp_block > 1 or newton_plateau)
                          else refine * 2)
            fp_hi = None
            if escalate:
                import jax as _jax
                if nx_val >= 96 and _jax.config.jax_enable_x64:
                    # fine-grid rung: FLOAT64-emulated h<=16 chord-free
                    # solve via the XLA path. At nx=128 the stiff
                    # thin-sample/high-fluence rows at high mobility pin
                    # the f32 damped Newton at the cap at EVERY f32 rung
                    # (h16, h4, even gold h4/refine2 — the flagship
                    # ridge-arm coverage gap,
                    # docs/POSTERIOR_r07_flagship.md), while the same
                    # states in emulated f64 converge to resid ~1e-3 and
                    # match the LSODA oracle to |dll| <= 0.118 at h16/F1
                    # (0.084 at the chord refine-2 variant, whose
                    # 4-step-unrolled blocks however compile a ~4x
                    # larger XLA program — enough to wedge the remote
                    # compiler inside the window scan; h16/F1's plain
                    # per-step body keeps the kernel compilable at the
                    # same measured accuracy class —
                    # scripts/probe_r14_ridge64.py).
                    fp_hi = _mk(refine, chord=False,
                                hm_x=min(hm, 16.0))._replace(
                                    solve_dtype="float64")
                else:
                    if nx_val >= 96:
                        import logging
                        logging.getLogger("MCMC").warning(
                            "jax_enable_x64 is off: the nx>=96 escalation "
                            "rung falls back to float32 h<=16, which "
                            "cannot repair the stiff high-mobility rows "
                            "(flagship ridge arm stays uncovered). Enable "
                            "x64 before building kernels for full "
                            "coverage.")
                    fp_hi = _mk(esc_refine, chord=False, hm_x=esc_hm)
            fwd.append((idx, _mk(refine), fp_hi))
        fwd = tuple(fwd)

    if kind in ("pde", "nn"):
        # IRF machinery is solver-independent: the reference convolves
        # EVERY solver's output, NN surrogate included
        # (trial_move_evaluation.py:75-94)
        irf_spec = MCMC_fields.get("irf_convolution", None)
        if irf_spec is not None:
            irf_tables = irf_tables or {}
            nk_irf = max(
                (len(irf_tables[int(w)][0]) for w in irf_spec if w > 0),
                default=1)
            # resample grids: arange(0, t_end + dt/4, dt/2) per measurement
            res_list = []
            for m in range(n_meas):
                w = int(irf_spec[m])
                if w > 0:
                    table, t_irf = irf_tables[w]
                    dt_irf = float(np.mean(np.diff(t_irf)))
                    r = np.arange(0, times[m][-1] + dt_irf / 4, dt_irf / 2)
                    if r[-1] > times[m][-1]:
                        r[-1] = times[m][-1]
                    if len(r) % 2 == 0:  # need 2*nk + 1 points
                        r = r[:-1]
                    res_list.append(r)
                    has_irf[m] = True
                else:
                    res_list.append(np.array([0.0, 1.0, 2.0]))
            R = max(len(r) for r in res_list)
            if R % 2 == 0:
                R += 1
            res_t = np.zeros((n_meas, R))
            irf_mats = np.zeros((n_meas, nk_irf, 3))
            for m in range(n_meas):
                r = res_list[m]
                res_t[m, :len(r)] = r
                # pad with continuing half-steps (harmless; masked by n_conv)
                if len(r) < R:
                    step = r[-1] - r[-2] if len(r) > 1 else 1.0
                    res_t[m, len(r):] = r[-1] + step * np.arange(
                        1, R - len(r) + 1)
                n_conv[m] = (len(r) - 1) // 2 + 1
                w = int(irf_spec[m])
                if w > 0:
                    table = irf_tables[w][0]
                    irf_mats[m, :len(table)] = table

    init_profiles = np.asarray(iniPar, dtype=float)
    if MCMC_fields["ini_mode"] == "fluence" and init_profiles.shape[1] < 3:
        pad = np.ones((n_meas, 3 - init_profiles.shape[1]))
        init_profiles = np.concatenate([init_profiles, pad], axis=1)

    nn = None
    if kind == "nn":
        from metrotrpl_tpu.surrogate import NeuralNetwork
        nn = NeuralNetwork()
        nn.load_model(solver_spec[1], solver_spec[2])

    return LikelihoodPlan(
        kind=kind,
        fwd=fwd,
        n_meas=n_meas,
        n_params=n_params,
        param_names=tuple(names),
        units=units,
        param_idx=param_idx,
        exp_times=exp_times,
        exp_vals=exp_vals,
        exp_uncs=exp_uncs,
        exp_mask=exp_mask,
        sigma=sigma,
        scale_idx=scale_idx,
        fluence_idx=fluence_idx,
        absp_idx=absp_idx,
        ini_mode=MCMC_fields["ini_mode"],
        init_profiles=init_profiles,
        has_irf=has_irf,
        irf_tables=irf_mats,
        res_t=res_t,
        n_conv=n_conv,
        force_min_y=bool(MCMC_fields.get("force_min_y", 0)),
        log_y=bool(MCMC_fields["log_y"]),
        nn=nn,
        thickness=np.asarray(sim_info["lengths"], dtype=float),
        # config knob (`newton_div_tol:` MCMC flag / TOML [solver] key);
        # None = per-nx-group calibrated default, resolved in the eval
        newton_div_tol=_resolve_newton_div_tol(
            newton_div_tol if newton_div_tol is not None
            else MCMC_fields.get("newton_div_tol")),
        esc_gate_score=float(
            MCMC_fields.get("escalate_gate_score", ESCALATE_GATE_SCORE)),
    )


def _gather_or_one(states, idx):
    """states (..., P), idx (M,) with -1 meaning 'no parameter' -> (..., M)."""
    safe = jnp.maximum(idx, 0)
    vals = states[..., safe]
    return jnp.where(idx >= 0, vals, jnp.ones_like(vals))


def _make_compare_pipeline(plan, dtype):
    """Shared post-solve comparison pipeline: IRF convolution (when
    configured), negative-value tolerance, force_min_y tail clamp, and the
    tempered Gaussian log-likelihood. Applied IDENTICALLY to the PDE
    solver's and the NN surrogate's output — the reference runs
    one_sim_likelihood:75-158 on every solver's curve, NN included
    (trial_move_evaluation.py:75-94).

    Returns compare(sol (K*M, nt_exp) on the experiment grid,
    scale_shift (K*M,) log10 scale factors, temps (Kt,)) -> ll (K*M, Kt)
    with -inf rows for failed comparisons (conv peak at the end, too many
    negatives, no valid points)."""
    M = plan.n_meas
    exp_times = jnp.asarray(plan.exp_times, dtype)
    exp_vals = jnp.asarray(plan.exp_vals, dtype)
    exp_uncs2 = 2.0 * jnp.asarray(plan.exp_uncs, dtype) ** 2
    exp_mask = jnp.asarray(plan.exp_mask)
    sigma2 = jnp.asarray(plan.sigma, dtype) ** 2
    has_irf = jnp.asarray(plan.has_irf)
    irf_tables = jnp.asarray(plan.irf_tables, dtype)
    res_t = jnp.asarray(plan.res_t, dtype)
    n_conv = jnp.asarray(plan.n_conv)
    R = plan.res_t.shape[1]
    n_conv_pts = (R - 1) // 2 + 1
    conv_t_base = res_t[:, ::2]                               # (M, ncp)

    def compare(sol, scale_shift, temps):
        K = sol.shape[0] // M

        def tile_m(a):  # (M, ...) -> (K*M, ...)
            return jnp.tile(a, (K,) + (1,) * (a.ndim - 1))

        b_exp_t = tile_m(exp_times)
        b_exp_mask = tile_m(exp_mask)

        # ---- IRF convolution path (computed for every row, selected) ----
        b_res_t = tile_m(res_t)
        resampled = jax.vmap(interp1d)(b_res_t, b_exp_t, sol)
        resampled = jnp.nan_to_num(resampled, nan=0.0)
        conv = convolve_moments(resampled, tile_m(irf_tables))  # (K*M, ncp)
        conv_pts = jnp.arange(n_conv_pts)[None, :]
        conv_valid = conv_pts < tile_m(n_conv)[:, None]
        # max-shift: time origin moves to the peak of the convolved signal
        conv_masked = jnp.where(conv_valid, conv, -jnp.inf)
        shift_i = jnp.argmax(conv_masked, axis=1)
        b_conv_t = tile_m(conv_t_base)
        t_shift = jnp.take_along_axis(b_conv_t, shift_i[:, None], axis=1)
        conv_t_shifted = b_conv_t - t_shift
        t_last = jnp.take_along_axis(
            b_conv_t, (tile_m(n_conv) - 1)[:, None], axis=1)
        conv_fail = (t_last - t_shift)[:, 0] <= 0.0  # peak at the end
        # re-interpolate onto experimental times; truncate to the convolved span
        sol_irf = jax.vmap(interp1d)(b_exp_t, conv_t_shifted, conv)
        irf_valid = b_exp_t < (t_last - t_shift)
        # guard: padded conv region must not pollute the interp — conv_t rows
        # are increasing over the full R so interp stays well-defined; values
        # beyond n_conv are extrapolations masked by irf_valid.

        b_has_irf = tile_m(has_irf)[:, None]
        sol_cmp = jnp.where(b_has_irf, sol_irf, sol)
        valid = jnp.where(b_has_irf, irf_valid & b_exp_mask, b_exp_mask)
        fail = jnp.where(tile_m(has_irf), conv_fail, False)

        # ---- negative-value tolerance (reference NEGATIVE_FRAC_TOL) ----
        n_valid = jnp.sum(valid, axis=1)
        n_neg = jnp.sum((sol_cmp < 0) & valid, axis=1)
        fail = fail | (n_neg >= NEGATIVE_FRAC_TOL * n_valid) | (n_valid == 0)
        sol_cmp = jnp.abs(sol_cmp)

        b_vals = tile_m(exp_vals)
        b_uncs2 = tile_m(exp_uncs2)

        # ---- force_min_y (reference utils.set_min_y) ----
        # i_final = count of points above min_y; clamping positions >=
        # i_final equals the reference's searchsorted cut exactly for the
        # monotone-decreasing decays it supports. For non-monotone signals
        # the reference binary-searches UNSORTED data (utils.py:29 —
        # arbitrary result); we deliberately use this deterministic
        # tail-clamp instead.
        if plan.force_min_y:
            vals_min = jnp.min(
                jnp.where(valid, b_vals, jnp.inf), axis=1)
            min_y = 10.0 ** (vals_min - scale_shift)
            i_final = jnp.sum((sol_cmp > min_y[:, None]) & valid, axis=1)
            pos = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
            clamp = valid & (pos >= i_final[:, None])
            sol_cmp = jnp.where(clamp, min_y[:, None], sol_cmp)

        # ---- tempered Gaussian log-likelihood ----
        log_sol = jnp.log10(sol_cmp)
        err2 = (log_sol + scale_shift[:, None] - b_vals) ** 2
        err2 = jnp.where(valid, err2, 0.0)
        b_sigma2 = tile_m(sigma2)                             # (K*M,)
        # ll(T) = -sum err^2 / (sigma^2 T + 2 u^2)
        denom = (b_sigma2[:, None, None] * temps[None, None, :]
                 + b_uncs2[:, :, None])                       # (K*M, nt, Kt)
        ll = -jnp.sum(err2[:, :, None] / denom, axis=1)       # (K*M, Kt)
        ll = jnp.where(jnp.isnan(ll), -jnp.inf, ll)
        ll = jnp.where(fail[:, None], -jnp.inf, ll)
        return ll

    return compare


def make_eval_logll(plan, dtype=jnp.float64, backend="xla", block_b=None,
                    eval_chunk=None, escalate="inline", batch_mult=1):
    """Build the batched evaluation function.

    backend : "xla" (portable), "pallas" (fused TPU kernel), or "auto"
    (pallas on TPU — fastest at every measured batch size — xla on
    CPU/GPU; choice made in solve_forward_batch).
    eval_chunk : evaluate at most this many states per solver batch,
    looping chunks sequentially (lax.map). Bounds the solver working set:
    the XLA stepper's materialized PCR factors spill VMEM past ~64
    simultaneous simulations and throughput collapses ~8x
    (docs/TPU_NOTES.md) — chunking keeps large multi-ensemble batches at
    the per-chunk optimum instead.
    escalate : "inline" re-solves non-finite rows on the plan's 2x-refined
    grid inside the eval (reference converge_simulation semantics). On
    this TPU runtime the data-dependent ``lax.cond`` costs ~10 ms per call
    even when never taken (~47%% of a healthy staub eval), so the MH driver
    instead runs with "off" — no retry, failures counted — and re-runs any
    window that reported failures through an "inline" kernel
    (metropolis.run_mh deferred escalation; identical results, zero
    hot-path cost when healthy).

    Returns eval_logll(states, temps) with
        states : (K, P) parameter states in entry units
        temps : (Kt,) tempering temperatures
    -> dict with
        'logll_T'  : (K, Kt) total log-likelihood of each state at each T
        'per_meas' : (K, M, Kt) per-measurement contributions
        'n_solver_fail' : () int32, rows whose forward solve diverged
            (post-repair count under "inline")
        'fail_states' : (K,) int32, diverged-solve count per STATE (summed
            over measurements) — lets multi-ensemble drivers escalate at
            per-ensemble granularity instead of re-running everything
            (VERDICT r3 weak #3)
        'resid' : (K, M) Newton-convergence residual of each forward solve
            (post-repair under "inline"; 0 for pa/nn — diagnostic only,
            the failure decision already folds it in via NEWTON_DIV_TOL)
    """
    M = plan.n_meas
    units = jnp.asarray(plan.units, dtype)
    scale_idx = jnp.asarray(plan.scale_idx)
    fluence_idx = jnp.asarray(plan.fluence_idx)
    absp_idx = jnp.asarray(plan.absp_idx)

    if plan.kind == "pa":
        def eval_pa(states, temps):
            u = u_potential(states[:, 0])                     # (K,)
            ll = -u[:, None] / temps[None, :]                 # (K, Kt)
            return {"logll_T": ll, "per_meas": ll[:, None, :],
                    "n_solver_fail": jnp.zeros((), jnp.int32),
                    "fail_states": jnp.zeros((states.shape[0],), jnp.int32),
                    "resid": jnp.zeros((states.shape[0], 1), ll.dtype),
                    "esc_score": jnp.zeros((states.shape[0], 1), ll.dtype)}
        return eval_pa

    if plan.kind == "nn":
        return _make_eval_nn(plan, dtype)

    groups = plan.fwd
    nt_exp = plan.exp_times.shape[1]
    init_profiles = jnp.asarray(plan.init_profiles, dtype)
    compare = _make_compare_pipeline(plan, dtype)
    plan_tol = getattr(plan, "newton_div_tol", None)
    esc_gate = float(getattr(plan, "esc_gate_score", ESCALATE_GATE_SCORE))
    from metrotrpl_tpu.solver.sdirk import NEWTON_DAMP

    model = groups[0][1].model

    def eval_logll(states, temps):
        K = states.shape[0]
        model_states = states * units[None, :]                # (K, P)

        # ---- expand to the (K*M) simulation batch ----
        f_mult = _gather_or_one(states, fluence_idx)          # (K, M)
        a_mult = _gather_or_one(states, absp_idx)
        s_fact = _gather_or_one(states, scale_idx)
        scale_shift = jnp.log10(s_fact).reshape(K * M)        # (K*M,)

        # ---- one forward solve per nx-group; scatter into (K, M, nt) ----
        sol_full = jnp.zeros((K, M, nt_exp), dtype)
        resid_full = jnp.zeros((K, M), dtype)
        score_full = jnp.zeros((K, M), dtype)
        n_solver_fail = jnp.zeros((), jnp.int32)
        fail_states = jnp.zeros((K,), jnp.int32)
        for g_idx, fp, fp_hi in groups:
            Mg = len(g_idx)
            # per-nx-group divergence threshold (plan override wins;
            # ADVICE r4 #2 — each grid judged at its own calibration)
            newton_div_tol = (float(plan_tol) if plan_tol is not None
                              else newton_div_tol_default(fp.nx))

            def tile_g(a):  # (Mg, ...) -> (K*Mg, ...)
                return jnp.tile(a, (K,) + (1,) * (a.ndim - 1))

            raw = {}
            for n in ("n0", "p0", "mu_n", "mu_p", "ks", "Cn", "Cp", "Sf",
                      "Sb", "tauN", "tauP", "eps", "Tm", "kC", "Nt", "tauE"):
                if n in plan.param_idx:
                    raw[n] = jnp.repeat(
                        model_states[:, plan.param_idx[n]], Mg, axis=0)

            x_g = jnp.asarray(fp.x_centers, dtype)
            if plan.ini_mode == "fluence":
                fl = (init_profiles[None, g_idx, 0] * 1e-14)                     * f_mult[:, g_idx]
                al = (init_profiles[None, g_idx, 1] * 1e-7)                     * a_mult[:, g_idx]
                dr = jnp.tile(init_profiles[None, g_idx, 2], (K, 1))
                init_dN = beer_lambert(
                    fl.reshape(K * Mg, 1), al.reshape(K * Mg, 1),
                    tile_g(x_g), dr.reshape(K * Mg, 1))
            else:
                init_dN = tile_g(
                    init_profiles[g_idx] * 1e-21)  # [cm^-3]->[nm^-3]

            def run_solve(fp_x):
                # plan-level dtype override (the f64-emulated escalation
                # rung, ForwardPlan.solve_dtype): solve in that dtype on
                # the XLA path (Mosaic has no f64), cast results back to
                # the walk dtype so lax.cond branch signatures match
                sd = getattr(fp_x, "solve_dtype", None)
                cdt = dtype if sd is None else jnp.dtype(sd)
                bk = backend if sd is None else "xla"
                sol_x, resid_x = solve_forward_batch(
                    init_dN.astype(cdt),
                    ({k: v.astype(cdt) for k, v in raw.items()}
                     if sd is not None else raw),
                    tile_g(jnp.asarray(fp_x.dx, cdt)),
                    tile_g(jnp.asarray(fp_x.dt, cdt)),
                    tile_g(jnp.asarray(fp_x.out_idx)),
                    tile_g(jnp.asarray(fp_x.is_trpl)),
                    model=model, scheme=fp_x.scheme,
                    newton_iters=fp_x.newton_iters, backend=bk,
                    block_b=block_b, batch_mult=batch_mult,
                    out_w=(None if fp_x.out_w is None
                           else tile_g(jnp.asarray(fp_x.out_w, cdt))),
                    refactor_every=fp_x.refactor_every,
                    n_ramp=fp_x.n_ramp,
                    ramp_block=fp_x.ramp_block,
                    newton_plateau=fp_x.newton_plateau,
                    with_diag=True)  # ((K*Mg, nt_g), (K*Mg,))
                return sol_x.astype(dtype), resid_x.astype(dtype)

            sol_g, resid_g = run_solve(fp)
            floor = 4 * np.finfo(np.dtype(sol_g.dtype)).tiny

            def fail_static(sol):
                # unusable output: non-finite, OR pinned at the solver's
                # underflow clamp (solve_forward_batch holds everything
                # past the first sub-tiny dip at min_y=tiny): no physical
                # TRPL/TRTS signal spans the ~38 decades down to f32 tiny
                # within a measured window, so a clamp touch means the
                # integration collapsed (observed at chord h48/F4 for
                # mu ~ 30-70 off-truth states: the stale-factor Newton
                # diverges DOWNWARD, leaving a finite but astronomically
                # wrong ll that the non-finite test alone never catches —
                # docs/TPU_NOTES.md round-7)
                return (~jnp.all(jnp.isfinite(sol), axis=-1)
                        | jnp.any(sol <= floor, axis=-1))

            def fail_resid(resid):
                # the dynamic predicate: a Newton iteration that never
                # converged (resid = max |last Newton update| over the
                # row's real window, solve_forward_batch with_diag)
                # catches the PARTIAL collapses that stay above the clamp
                # yet are decades off the f64 oracle (round-8). ~(x < tol)
                # instead of x >= tol so a NaN resid also flags.
                return ~(resid < newton_div_tol)

            # deterministic escalation GATE (ESCALATE_GATE_SCORE doc):
            # mean squared log10 distance of the fast solve to the data,
            # over valid NON-COLLAPSED points only — a collapse victim's
            # pre-collapse points score its true fit (so typical-zone
            # collapse rows stay repairable) while a hopeless-fit hot
            # state scores hopeless from its surviving points too.
            # Log-space data only; linear-y configs gate everything in.
            if plan.log_y:
                nt_g = sol_g.shape[-1]
                v = tile_g(jnp.asarray(plan.exp_vals[g_idx][:, :nt_g],
                                       dtype))
                mk = tile_g(jnp.asarray(plan.exp_mask[g_idx][:, :nt_g]))
                ok_pt = mk & jnp.isfinite(sol_g) & (sol_g > 10 * floor)
                ls = jnp.log10(jnp.maximum(jnp.abs(sol_g), floor))
                # the fitted scale factor shifts the simulated curve
                # before comparison (ADVICE r4 #1: omitting it scored
                # every |log10 s| > ~0.5 config as hopeless-fit, which
                # permanently closed the gate and disabled repair)
                ss_g = jnp.log10(s_fact[:, g_idx]).reshape(K * Mg)
                err2g = jnp.where(ok_pt,
                                  (ls + ss_g[:, None] - v) ** 2, 0.0)
                score = (jnp.sum(err2g, axis=-1)
                         / jnp.maximum(jnp.sum(ok_pt, axis=-1), 1))
                # IRF rows: the raw pointwise distance ignores the
                # convolution/max-shift alignment the real likelihood
                # applies, so the score is biased there — gate them IN
                # (always repairable; conservative: extra repairs, never
                # a wrongly-kept wrong ll) rather than score them wrong
                irf_g = tile_g(jnp.asarray(plan.has_irf[g_idx]))
                gate = (score < esc_gate) | irf_g
            else:
                score = jnp.zeros(sol_g.shape[:1], dtype)
                gate = jnp.ones(sol_g.shape[:1], bool)
            score_full = score_full.at[:, g_idx].set(
                score.reshape(K, Mg))

            hi_is_f64 = (fp_hi is not None
                         and getattr(fp_hi, "solve_dtype", None)
                         == "float64")
            if hi_is_f64:
                # f64-rung trigger (probe_r14/r16 calibration): static
                # and cap-pinned rows repair UNGATED — their fast curve
                # is garbage, so the fit-score gate would be judging
                # noise (the round-4 gate wrongly blocked repair of
                # cold-typical ridge rows exactly this way). Sub-cap
                # residual flags and the high-mobility structural
                # trigger keep the score gate: their curves are sane
                # enough to score, and hot tempered chains at
                # hopeless-fit states stay in the cheap deformed-tail
                # semantics instead of firing the rung continuously.
                pinned_g = ~(resid_g < 0.97 * float(NEWTON_DAMP))
                mu_row = raw["mu_n"]
                if "mu_p" in raw:
                    mu_row = jnp.maximum(mu_row, raw["mu_p"])
                mu_trig = mu_row > ESCALATE_MU_MODEL
                repair = (fail_static(sol_g) | pinned_g
                          | ((fail_resid(resid_g) | mu_trig) & gate))
            else:
                bad = fail_static(sol_g) | fail_resid(resid_g)  # (K*Mg,)
                repair = bad & gate
            if fp_hi is not None and escalate == "inline":
                # solver-failure escalation (reference converge_simulation,
                # trial_move_evaluation.py:168-210): gated rows whose base
                # solve diverged are re-solved on the escalated plan
                # before conceding -inf. lax.cond skips the escalated
                # solve entirely when no row needs repair (but costs
                # ~10 ms of control-flow overhead per call on TPU).
                sol_hi, resid_hi = jax.lax.cond(
                    jnp.any(repair),
                    lambda _: run_solve(fp_hi),
                    lambda _: (sol_g, resid_g),
                    None)
                sol_g = jnp.where(repair[:, None], sol_hi, sol_g)
                resid_g = jnp.where(repair, resid_hi, resid_g)
            # concessions (-inf): unusable output always; Newton-flagged
            # rows only INSIDE the gate (outside it the finite fast ll
            # stands — the deterministic deformed-tail semantics of the
            # gate doc). Without the nan-out, a clamp-collapsed row keeps
            # its finite-but-astronomical ll (~-7e7), which behaves like
            # -inf under MH acceptance but poisons any consumer that
            # reads the ll itself (resume carry, artifacts, logs).
            if hi_is_f64:
                # post-repair: a row still static/cap-pinned after the
                # f64 rung is genuinely unsolvable (none observed across
                # the measured prior box) -> -inf like the reference's
                # exception path. Sub-cap flags keep the gate semantics.
                # resid_g/sol_g here are post-repair under inline (the
                # jnp.where above) and the raw base outputs otherwise, so
                # re-deriving pinned from resid_g is correct either way.
                concede = (fail_static(sol_g)
                           | ~(resid_g < 0.97 * float(NEWTON_DAMP))
                           | (fail_resid(resid_g) & gate))
            else:
                concede = fail_static(sol_g) | (fail_resid(resid_g) & gate)
            sol_g = jnp.where(concede[:, None], jnp.nan, sol_g)
            # the failure COUNTERS drive deferred escalation re-runs:
            # legacy ladder counts repairable (gated) concessions; the
            # f64 ladder counts, in the hot escalate-free kernel, every
            # row the inline kernel WOULD repair (the deferred re-run
            # must fire whenever the inline result would differ), and
            # under inline the post-repair concessions (normally zero)
            nfail_g = (repair if (hi_is_f64 and escalate != "inline")
                       else concede & gate)
            n_solver_fail = n_solver_fail + jnp.sum(nfail_g,
                                                    dtype=jnp.int32)
            fail_states = fail_states + jnp.sum(
                nfail_g.reshape(K, Mg), axis=1, dtype=jnp.int32)
            sol_g = sol_g.reshape(K, Mg, -1)
            if sol_g.shape[-1] < nt_exp:
                sol_g = jnp.pad(
                    sol_g, ((0, 0), (0, 0), (0, nt_exp - sol_g.shape[-1])))
            sol_full = sol_full.at[:, g_idx, :].set(sol_g[..., :nt_exp])
            resid_full = resid_full.at[:, g_idx].set(
                resid_g.reshape(K, Mg))
        sol = sol_full.reshape(K * M, nt_exp)

        # shared comparison pipeline: IRF convolution, negative tolerance,
        # force_min_y, tempered Gaussian ll (identical for the NN path)
        ll = compare(sol, scale_shift, temps)

        per_meas = ll.reshape(K, M, -1)
        return {"logll_T": jnp.sum(per_meas, axis=1), "per_meas": per_meas,
                "n_solver_fail": n_solver_fail, "fail_states": fail_states,
                "resid": resid_full, "esc_score": score_full}

    if eval_chunk is None:
        return eval_logll

    def eval_chunked(states, temps):
        K = states.shape[0]
        if K <= eval_chunk:
            return eval_logll(states, temps)
        # Pad K up to a chunk multiple with copies of row 0 so every batch
        # size stays under the VMEM bound (an unchunked fallback here would
        # silently re-enter the >~64-sim spill regime this chunking
        # exists to avoid). Pad rows only inflate the n_solver_fail
        # diagnostic if row 0 itself fails.
        Kp = -(-K // eval_chunk) * eval_chunk
        padded = states if Kp == K else jnp.concatenate(
            [states, jnp.broadcast_to(states[:1],
                                      (Kp - K,) + states.shape[1:])], axis=0)
        chunks = padded.reshape(Kp // eval_chunk, eval_chunk, -1)
        out = jax.lax.map(lambda s: eval_logll(s, temps), chunks)
        fail_states = out["fail_states"].reshape((Kp,))[:K]
        return {"logll_T": out["logll_T"].reshape(
                    (Kp,) + out["logll_T"].shape[2:])[:K],
                "per_meas": out["per_meas"].reshape(
                    (Kp,) + out["per_meas"].shape[2:])[:K],
                "n_solver_fail": fail_states.sum(dtype=jnp.int32),
                "fail_states": fail_states,
                "resid": out["resid"].reshape(
                    (Kp,) + out["resid"].shape[2:])[:K],
                "esc_score": out["esc_score"].reshape(
                    (Kp,) + out["esc_score"].shape[2:])[:K]}

    return eval_chunked


def _make_eval_nn(plan, dtype):
    """Likelihood evaluation with the NN-surrogate forward model.

    Features follow the reference's NN branch (forward_solver.py:213-219):
    [p0, mu_n, mu_p, ks, Cn, Cp, Sf, Sb, tauN, tauP, 1/eps,
     fluence, absp, thickness] in ENTRY units (the reference skips unit
    conversion for the NN path). TRPL only. The surrogate's curve then
    runs through the SAME comparison pipeline as the PDE solver's —
    IRF convolution included (the reference applies do_irf_convolution to
    every solver's output, trial_move_evaluation.py:75-94).
    """
    from metrotrpl_tpu.surrogate import multiexp

    M = plan.n_meas
    nn = plan.nn
    exp_times = jnp.asarray(plan.exp_times, dtype)
    thick = jnp.asarray(plan.thickness, dtype)
    init_profiles = jnp.asarray(plan.init_profiles, dtype)
    scale_idx = jnp.asarray(plan.scale_idx)
    fluence_idx = jnp.asarray(plan.fluence_idx)
    absp_idx = jnp.asarray(plan.absp_idx)
    pidx = plan.param_idx
    compare = _make_compare_pipeline(plan, dtype)

    feat_names = ("p0", "mu_n", "mu_p", "ks", "Cn", "Cp", "Sf", "Sb",
                  "tauN", "tauP")

    def eval_nn(states, temps):
        K = states.shape[0]
        cols = [jnp.repeat(states[:, pidx[n]], M) for n in feat_names]
        cols.append(jnp.repeat(1.0 / states[:, pidx["eps"]], M))
        # fittable _f/_a multipliers apply before NN feature assembly,
        # exactly as the reference multiplies iniPar[0]/iniPar[1]
        # (trial_move_evaluation.py:39-51) before forward_solver.py:214-219
        f_mult = _gather_or_one(states, fluence_idx)          # (K, M)
        a_mult = _gather_or_one(states, absp_idx)
        cols.append((init_profiles[None, :, 0] * f_mult).reshape(K * M))
        cols.append((init_profiles[None, :, 1] * a_mult).reshape(K * M))
        cols.append(jnp.tile(thick, K))
        feats = jnp.stack(cols, axis=1)                       # (K*M, 14)
        coefs = nn.postprocess(nn.apply(nn.preprocess(feats)))
        b_t = jnp.tile(exp_times, (K, 1))
        sol = multiexp(b_t, coefs)                            # (K*M, nt)

        s_fact = _gather_or_one(states, scale_idx)            # (K, M)
        scale_shift = jnp.log10(s_fact).reshape(K * M)

        # shared comparison pipeline: IRF convolution (resampling the
        # multiexp curve from the experiment grid exactly like the PDE
        # path), negative tolerance, force_min_y, tempered Gaussian ll
        ll = compare(sol, scale_shift, temps)
        per_meas = ll.reshape(K, M, -1)
        return {"logll_T": jnp.sum(per_meas, axis=1), "per_meas": per_meas,
                "n_solver_fail": jnp.zeros((), jnp.int32),
                "fail_states": jnp.zeros((K,), jnp.int32),
                "resid": jnp.zeros((K, M), ll.dtype),
                "esc_score": jnp.zeros((K, M), ll.dtype)}

    return eval_nn
