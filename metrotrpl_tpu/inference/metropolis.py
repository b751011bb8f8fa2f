"""Metropolis-Hastings walk with parallel tempering, compiled on-device.

TPU re-architecture of the reference driver (reference metropolis.py:42-267):

* The whole (propose -> batched solve -> likelihood -> accept -> swap) step
  is one pure function of (carry, iteration index); a checkpoint window of
  iterations runs as a single ``lax.scan``.
* All chains advance simultaneously — proposals vmapped, the (chains x
  measurements) forward solves batched into one implicit-solver scan.
* Tempering swaps (reference :204-261) use the precomputed
  (chains x temperatures) log-likelihood matrix instead of re-evaluating
  ll_funcs: a swap permutes two rows of the tiny state/ll arrays.
* The iteration/window body itself lives in inference/mh_core.py, SHARED
  with the multi-chip shard_map kernel (parallel/sharded_mh.py) — this
  module instantiates it on the trivial single-device topology. The RNG
  is the mesh-invariant keyed stream documented there: same seed =>
  bit-identical walk on one chip or any mesh layout, and bit-exact
  resume by construction (no generator state to restore).
"""

import os
import signal
from time import perf_counter
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from metrotrpl_tpu.constants import MSG_FREQ
from metrotrpl_tpu.inference.likelihood import (
    build_likelihood_plan,
    make_eval_logll,
    resolve_solver_mode,
)
from metrotrpl_tpu.inference.mh_core import (
    make_window_body,
    single_device_topology,
)
from metrotrpl_tpu.inference.moves import build_move_plan


class MHKernel(NamedTuple):
    """Compiled window runner + static run info."""
    run_window: callable      # (states, ll_T, k0, key[, n_valid]) ->
                              # (states, ll_T, swap_att, swap_acc, nfail, hist)
                              # n_valid (default window): real iterations;
                              # the scan tail past it is masked to no-ops
    init_ll: callable         # states -> ll_T
    n_chains: int
    temps: np.ndarray
    window: int               # iterations per compiled window


def build_mh_kernel(like_plan, move_plan, temps, base_trial_move, temper_freq,
                    do_tempering, window, dtype=jnp.float64,
                    shard_batch=None, backend="xla", block_b=None,
                    escalate="off", batch_mult=1):
    """Construct the compiled MH window function.

    temps : (K,) tempering temperatures (one chain per temperature).
    base_trial_move : (P,) per-parameter move widths (0 = frozen).
    window : static number of iterations per lax.scan (checkpoint window).
    shard_batch : optional callable applied to the batched states before
        evaluation (used by the parallel layer to insert sharding
        constraints).
    escalate : "off" (default) counts solver failures without retrying —
        run_mh re-runs any failing window through an "inline" kernel,
        which retries non-finite solves on the refined grid in-eval
        (deferred escalation; the inline lax.cond costs ~10 ms/call on
        TPU even when never taken, so it stays out of the hot path).
    """
    K = len(temps)
    temps_j = jnp.asarray(temps, dtype)
    base_move = jnp.asarray(base_trial_move, dtype)
    widths = jnp.sqrt(temps_j)[:, None] * base_move[None, :]  # (K, P)
    eval_logll = make_eval_logll(like_plan, dtype=dtype, backend=backend,
                                 block_b=block_b, escalate=escalate,
                                 batch_mult=batch_mult)
    n_params = like_plan.n_params

    def eval_nf(states_l):
        """(1, K, P) -> ((1, K, K), (1,)): the heavy batched solve."""
        states = states_l.reshape(K, n_params)
        if shard_batch is not None:
            states = shard_batch(states)
        r = eval_logll(states, temps_j)
        return (r["logll_T"].reshape(1, K, K),
                r["n_solver_fail"].reshape(1))

    def _make_body(e0):
        # e0 is a TRACED global-ensemble offset: the keyed RNG folds in
        # global ensemble indices, so run_window(..., e0=e) reproduces
        # ensemble e of a sharded run bit-exactly (per-ensemble deferred
        # escalation in run_mh_sharded)
        return make_window_body(
            eval_nf, move_plan, widths, temper_freq, do_tempering,
            window, dtype, single_device_topology(E_l=1, K=K, e0=e0))

    @jax.jit
    def _run_window(states, ll_T, k0, base_key, n_valid, e0):
        out = _make_body(e0)(states[None], ll_T[None], k0, base_key,
                             n_valid)
        states_l, ll_l, swap_att, swap_acc, nfail, hist = out
        return (states_l[0], ll_l[0], swap_att[0], swap_acc[0], nfail[0],
                jax.tree.map(lambda h: h[:, 0], hist))

    def run_window(states, ll_T, k0, base_key, n_valid=None, e0=0):
        nv = jnp.asarray(window if n_valid is None else n_valid, jnp.int32)
        return _run_window(states, ll_T, k0, base_key, nv,
                           jnp.asarray(e0, jnp.int32))

    @jax.jit
    def init_ll(states):
        return eval_nf(states[None])[0][0]

    return MHKernel(run_window=run_window, init_ll=init_ll, n_chains=K,
                    temps=np.asarray(temps), window=window)


def vmap_ensembles(kernel):
    """Vectorize a compiled MH kernel over a leading ensembles axis.

    States/ll/keys gain a leading E axis; each ensemble gets its own RNG
    key, so results equal E separate runs exactly. With the fused Pallas
    backend (backend="auto" on TPU) the E*K*M simulation batch KEEPS
    SCALING past the old VMEM cliff (sweep_r2_final: 3314 solves/s at
    B=48 -> 7346 at B=192), so this is the aggregate-throughput optimum
    for E >= 2. On the XLA backend the fused batch spills VMEM past ~64
    simultaneous simulations — there prefer
    :func:`run_ensembles_sequential`.
    """
    vrun = jax.jit(jax.vmap(
        lambda s, ll, k0, key, nv: kernel.run_window(s, ll, k0, key, nv),
        in_axes=(0, 0, None, 0, None)))

    def run_window_E(states, ll, k0, keys, n_valid=None):
        nv = jnp.asarray(kernel.window if n_valid is None else n_valid,
                         jnp.int32)
        return vrun(states, ll, k0, keys, nv)

    return kernel._replace(
        run_window=run_window_E,
        init_ll=jax.jit(jax.vmap(kernel.init_ll)),
    )


def run_ensembles_sequential(kernel, states_E, ll_E, k0, keys_E,
                             n_valid=None):
    """Advance E independent tempered ensembles one window each by running
    the compiled single-ensemble kernel back-to-back.

    This is the VMEM-optimal multi-ensemble schedule for the XLA op-graph
    backend: one ensemble's (K x M) solve batch sits at that stepper's
    throughput optimum, while a fused E-fold batch crosses its VMEM spill
    cliff and runs 4-8x slower in aggregate (docs/TPU_NOTES.md round-2
    table). With the fused Pallas backend :func:`vmap_ensembles` is faster.
    All E window executions are dispatched asynchronously, so the device
    runs them gaplessly; aggregate throughput equals E x the single-
    ensemble rate per window, i.e. the chip's peak.

    states_E : (E, K, P); ll_E : (E, K, Kt); keys_E : (E,) PRNG keys.
    Returns stacked (states, ll, swap_att, swap_acc, hist) with leading E.
    """
    outs = [kernel.run_window(states_E[e], ll_E[e], k0, keys_E[e], n_valid)
            for e in range(states_E.shape[0])]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *outs)


def _plan_has_f64_rung(like_plan):
    """True when any nx-group's escalation plan is the f64-emulated rung.
    The fused-inline adaptive switch must NOT engage then: under vmap the
    escalation cond lowers to a select that would run the emulated-f64
    solve for every ensemble on every call (~6x the fast eval), and the
    vmapped program with the f64 branch is large enough to wedge the
    remote compiler. Per-ensemble deferred re-runs through the
    single-ensemble inline kernel (a real lax.cond) stay the production
    schedule for such plans."""
    return any(
        fh is not None and getattr(fh, "solve_dtype", None) == "float64"
        for _, _, fh in (like_plan.fwd or ()))


def _restore_carried_ll(ensembles, K):
    """The (K, K) tempered ll matrix each chain carried at checkpoint
    time, or None if any replica lacks one (pre-carried-ll pickles,
    reference pickles, or a rewound resume). Restoring it instead of
    re-evaluating makes resume bit-exact: a standalone init_ll compiles a
    different reduction order than the same eval fused inside the window
    scan (~1 ulp on the PDE likelihood), and the carried ll persists in
    History through rejected moves."""
    mats = [getattr(ens, "_carried_ll", None) for ens in ensembles]
    if any(m is None or np.shape(m) != (K, K) for m in mats):
        return None
    return np.stack(mats)


def _even_window(total_iters, checkpoint_freq):
    """Checkpoint-window length splitting `total_iters` into near-equal
    windows no longer than `checkpoint_freq`.

    The window scan length is compiled in, so a static
    min(checkpoint_freq, num_iters) window would run (and discard) up to
    window-1 tail iterations of PDE solves in the final partial window;
    equal windows keep one compiled kernel and waste < n_windows
    iterations total, checkpointing at least as often as requested."""
    total = max(1, int(total_iters))
    n_win = -(-total // max(1, int(checkpoint_freq)))
    return -(-total // n_win)


def run_mh_fused(ensembles, like_plan, move_plan, logger, seeds,
                 export_paths=None, dtype=jnp.float64, starting_iter=0,
                 need_initial_state=True, backend="auto", escalate=True):
    """Advance E independent tempered ensembles in lockstep through ONE
    fused compiled kernel (:func:`vmap_ensembles`), the aggregate-
    throughput optimum on TPU with the fused Pallas backend (the E*K*M
    solve batch keeps scaling: +2.2x aggregate walker-steps at E=4 vs
    one ensemble — docs/TPU_NOTES.md sweep_r2_final).

    All ensembles must share the run geometry (temps, num_iters,
    checkpoint_freq, proposal plan — i.e. come from the same config) but
    each carries its own RNG stream, states, History, and export file;
    per-ensemble results are bit-identical to E separate :func:`run_mh`
    calls with the same seeds (vmap_ensembles contract,
    tests/test_metropolis.py).

    ensembles : list of io.ensemble.Ensemble (mutated in place).
    seeds : list of E RNG seeds (reference jobid semantics, main.py:36).
    export_paths : per-ensemble checkpoint filenames.

    This is :func:`run_mh`'s structural twin with an extra E axis; the
    window loop / deferred-escalation / history-scatter logic is kept in
    sync by tests (test_metro_n_ensembles_matches_separate_runs). Two
    deliberate differences: no profile_dir (profile single-ensemble runs)
    and no shard_batch (fused mode targets one chip; multi-chip runs
    shard chains via run_mh's shard_batch instead).
    """
    E = len(ensembles)
    if export_paths is None:
        export_paths = [f"CPU{e}-final.pik" for e in range(E)]
    ef0 = ensembles[0].ensemble_fields
    num_iters = ef0["num_iters"]
    checkpoint_freq = ef0.get("checkpoint_freq") or num_iters
    temps = np.asarray(ef0["_T"], dtype=float)
    K = len(temps)
    clock0 = perf_counter()

    keys_E = []
    for e, (ens, seed) in enumerate(zip(ensembles, seeds)):
        ens.ensemble_fields["_rng_seed"] = seed
        keys_E.append(jax.random.PRNGKey(seed % (2 ** 63)))
    keys_E = jnp.stack(keys_E)

    states_E = jnp.asarray(np.stack(
        [ens.H.states[:, :, max(starting_iter - 1, 0)] for ens in ensembles]
    ), dtype)

    window = _even_window(num_iters - max(1, starting_iter) + 1,
                          checkpoint_freq)

    def _build(esc_mode, mult=E):
        # mult=E: the kernel is traced per-ensemble under vmap, but the
        # device runs the E-fold fused batch — block_b must be chosen for
        # the TOTAL batch (solve_forward_batch batch_mult).
        return build_mh_kernel(
            like_plan, move_plan, temps, ef0["base_trial_move"],
            ef0.get("temper_freq", 10), ef0["do_parallel_tempering"],
            window=window, dtype=dtype, backend=backend, escalate=esc_mode,
            batch_mult=mult)

    base_kernel = _build("inline" if escalate == "inline" else "off")
    kernel = vmap_ensembles(base_kernel)
    safe_kernel = None  # built on first escalation (single-ensemble inline)
    esc_streak = 0      # consecutive windows that needed escalation
    inline_mode = escalate == "inline"

    carried = (None if need_initial_state
               else _restore_carried_ll(ensembles, K))
    ll_E = (kernel.init_ll(states_E) if carried is None
            else jnp.asarray(carried, dtype))
    if need_initial_state:
        logger.info(f"Simulating initial state ({E} fused ensembles):")
        ll_diag = np.asarray(jnp.take_along_axis(
            ll_E, jnp.broadcast_to(jnp.arange(K)[None, :, None],
                                   (E, K, 1)), axis=2))[:, :, 0]
        for e, ens in enumerate(ensembles):
            ens.H.loglikelihood[:, 0] = ll_diag[e]
        starting_iter = 1

    k = starting_iter
    while k < num_iters:
        n_this = min(window, num_iters - k)
        logger.info(f"Simulating from {k} to {k + n_this} "
                    f"({E} fused ensembles)")
        t_win = perf_counter()
        states_in, ll_in = states_E, ll_E
        out = kernel.run_window(states_E, ll_E, jnp.asarray(k), keys_E,
                                n_this)
        states_E, ll_E, swap_att, swap_acc, nfail, hist = out
        jax.block_until_ready(states_E)
        nfail_h = np.asarray(nfail)
        if nfail_h.any() and escalate is True and not inline_mode:
            # deferred escalation, per failing ensemble: re-run its window
            # from the SAME entry state/key through the single-ensemble
            # inline-retry kernel (bit-identical semantics — the vmapped
            # kernel IS the single kernel per ensemble slice).
            if safe_kernel is None:
                # single-ensemble re-run kernel: block for ONE ensemble's
                # batch (block_b never mixes rows, so results are
                # independent of the choice)
                safe_kernel = _build("inline", mult=1)
            fixes = {}
            for e in np.nonzero(nfail_h)[0]:
                logger.warning(
                    f"Ensemble {e} window {k}-{k + n_this}: "
                    f"{int(nfail_h[e])} diverged solves; re-running with "
                    "inline solver escalation")
                fixes[int(e)] = safe_kernel.run_window(
                    states_in[e], ll_in[e], jnp.asarray(k), keys_E[e],
                    n_this)
            outs = [jax.tree.map(lambda a, e=e: a[e], out)
                    for e in range(E)]
            for e, fix in fixes.items():
                if int(fix[4]):
                    logger.warning(
                        f"Ensemble {e}: {int(fix[4])} solves still "
                        "diverged on the refined grid (rejected as -inf)")
                outs[e] = fix
            out = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *outs)
            states_E, ll_E, swap_att, swap_acc, nfail, hist = out
            esc_streak += 1
            if esc_streak >= 3 and not _plan_has_f64_rung(like_plan):
                # persistent escalation across windows (tempered hot
                # chains): a fused INLINE kernel beats E serial deferred
                # re-runs — under vmap the escalation cond lowers to a
                # batched select (both branches run), which is exactly
                # right when it would fire every window anyway. NOT for
                # f64-rung plans (_plan_has_f64_rung): the select would
                # pay the emulated-f64 solve on every call and the
                # vmapped program wedges the compiler — per-ensemble
                # deferred re-runs stay the schedule there.
                logger.info(
                    "3 consecutive windows needed escalation; switching "
                    "to the fused inline-escalation kernel")
                kernel = vmap_ensembles(_build("inline"))
                inline_mode = True
        else:
            esc_streak = 0
        dt_win = perf_counter() - t_win
        logger.info(
            f"Window of {n_this} iters x {E} ensembles took {dt_win:.3f} s "
            f"({n_this * K * E / max(dt_win, 1e-9):.1f} "
            "aggregate walker-steps/s)")
        h_states, h_ll, h_accept = (np.asarray(h) for h in hist)
        ll_host = np.asarray(ll_E)
        for e, ens in enumerate(ensembles):
            H = ens.H
            # scan emits `window` iterations; keep the first n_this
            H.states[:, :, k:k + n_this] = (
                h_states[e, :n_this].transpose(1, 2, 0))
            H.loglikelihood[:, k:k + n_this] = h_ll[e, :n_this].T
            H.accept[:, k:k + n_this] = h_accept[e, :n_this].T
            H.swap_attempts += np.asarray(swap_att[e])
            H.swap_accept += np.asarray(swap_acc[e])
            ens.latest_iter = k + n_this
            ens._carried_ll = ll_host[e]
        k += n_this
        if k < num_iters:
            logger.info(f"Saving checkpoints at k={k}")
            for ens, ep in zip(ensembles, export_paths):
                ens.checkpoint(os.path.join(
                    ens.ensemble_fields["output_path"], ep))
        if k % MSG_FREQ < window:
            for e, ens in enumerate(ensembles):
                for m in range(K):
                    logger.info(
                        f"Iter {k} ensemble {e} chain {m} state: "
                        f"{ens.H.states[m, :, k - 1]} "
                        f"logll {ens.H.loglikelihood[m, k - 1]}")

    logger.info(f"Total fused walk ({E} ensembles) took "
                f"{perf_counter() - clock0} s")
    for ens, ep in zip(ensembles, export_paths):
        with np.errstate(divide="ignore", invalid="ignore"):
            rate = (100 * ens.H.swap_accept[:-1]
                    / np.maximum(ens.H.swap_attempts[:-1], 1))
        logger.info(
            f"Swap accept rate: {ens.H.swap_accept} accepted of "
            f"{ens.H.swap_attempts} attempts ({rate} %)")
        ens.checkpoint(os.path.join(
            ens.ensemble_fields["output_path"], ep))
    return ensembles


def run_mh_sharded(ensembles, like_plan, move_plan, logger, seed,
                   mesh_shape, export_paths=None, dtype=jnp.float32,
                   starting_iter=0, need_initial_state=True,
                   backend="auto", escalate=True, devices=None,
                   profile_dir=None):
    """Production multi-chip driver: the shard_map MH kernel
    (parallel/sharded_mh.py) run through the same host window loop as
    :func:`run_mh` — History scatter, per-window checkpoints, deferred
    solver escalation, logging, and bit-exact resume — the TPU-native
    equivalent of the reference's MPI driver (reference
    metropolis.py:400-453: scatter -> windows -> gather -> checkpoint;
    here states are BORN sharded, so there is no scatter/gather of state
    slabs, only the tiny history transfer each window).

    mesh_shape : (d_e, d_c) — devices along (ensembles, chains); requires
        len(ensembles) % d_e == 0 and n_chains % d_c == 0.
    seed : ONE shared seed; ensemble e, chain c draw from the
        mesh-invariant keyed stream (mh_core docstring), so the walk is
        bit-identical on any layout including single-chip run_mh
        (tests/test_parallel.py), and resume is bit-exact by construction.
    """
    from jax.sharding import Mesh

    from metrotrpl_tpu.parallel.sharded_mh import build_sharded_mh_kernel

    E = len(ensembles)
    d_e, d_c = mesh_shape
    n_dev = d_e * d_c
    devs = devices if devices is not None else jax.devices()[:n_dev]
    if len(devs) < n_dev:
        raise ValueError(f"mesh_shape {tuple(mesh_shape)} needs {n_dev} "
                         f"devices; only {len(devs)} available")
    mesh = Mesh(np.asarray(devs).reshape(d_e, d_c), ("ens", "chains"))
    if export_paths is None:
        export_paths = [f"CPU{e}-final.pik" for e in range(E)]
    ef0 = ensembles[0].ensemble_fields
    num_iters = ef0["num_iters"]
    checkpoint_freq = ef0.get("checkpoint_freq") or num_iters
    temps = np.asarray(ef0["_T"], dtype=float)
    K = len(temps)
    clock0 = perf_counter()

    for ens in ensembles:
        ens.ensemble_fields["_rng_seed"] = seed
    base_key = jax.random.PRNGKey(seed % (2 ** 63))

    states_E = jnp.asarray(np.stack(
        [ens.H.states[:, :, max(starting_iter - 1, 0)] for ens in ensembles]
    ), dtype)

    window = _even_window(num_iters - max(1, starting_iter) + 1,
                          checkpoint_freq)

    def _build(esc_mode):
        return build_sharded_mh_kernel(
            like_plan, move_plan, temps, ef0["base_trial_move"],
            ef0.get("temper_freq", 10), ef0["do_parallel_tempering"],
            window=window, mesh=mesh, n_ens=E, dtype=dtype,
            backend=backend, escalate=esc_mode)

    kernel = _build("inline" if escalate == "inline" else "off")
    safe_kernel = kernel if escalate == "inline" else None
    esc_streak = 0      # consecutive windows that needed escalation
    inline_mode = escalate == "inline"
    states_E = jax.device_put(states_E, kernel.state_sharding)

    carried = (None if need_initial_state
               else _restore_carried_ll(ensembles, K))
    ll_E = (kernel.init_ll(states_E) if carried is None
            # ll (E, K, K) shards like states (E, K, P): P(ens, chains, -)
            else jax.device_put(jnp.asarray(carried, dtype),
                                kernel.state_sharding))
    if need_initial_state:
        logger.info(f"Simulating initial state ({E} ensembles on "
                    f"{d_e}x{d_c} device mesh):")
        ll_diag = np.asarray(ll_E)[:, np.arange(K), np.arange(K)]
        for e, ens in enumerate(ensembles):
            ens.H.loglikelihood[:, 0] = ll_diag[e]
        starting_iter = 1

    k = starting_iter
    profiled = False
    while k < num_iters:
        n_this = min(window, num_iters - k)
        logger.info(f"Simulating from {k} to {k + n_this} "
                    f"({E} ensembles, {d_e}x{d_c} mesh)")
        t_win = perf_counter()
        states_in, ll_in = states_E, ll_E
        if profile_dir and not profiled:
            with jax.profiler.trace(profile_dir):
                out = kernel.run_window(states_E, ll_E, jnp.asarray(k),
                                        base_key, n_this)
                jax.block_until_ready(out[0])
            profiled = True
            logger.info(f"Profiler trace written to {profile_dir}")
        else:
            out = kernel.run_window(states_E, ll_E, jnp.asarray(k),
                                    base_key, n_this)
        states_E, ll_E, swap_att, swap_acc, nfail, hist = out
        jax.block_until_ready(states_E)
        nfail_h = np.asarray(nfail)                     # (E,) per ensemble
        # history: (window, E, K, ...) gathered to host once per window
        h_states, h_ll, h_accept = (np.asarray(h) for h in hist)
        ll_host = np.asarray(ll_E)
        if nfail_h.any() and escalate is True and not inline_mode:
            # deferred escalation at PER-ENSEMBLE granularity (the fused
            # driver's contract): only ensembles that reported diverged
            # solves re-run, each from its SAME entry state/key through
            # the single-device inline-retry kernel with the matching
            # global-ensemble RNG offset (run_window e0=e) — the keyed
            # stream folds in global (e, chain), so the re-run reproduces
            # exactly that ensemble's window with retries applied, at
            # 1/E of the old whole-mesh re-run cost (VERDICT r3 weak #3).
            if safe_kernel is None:
                safe_kernel = build_mh_kernel(
                    like_plan, move_plan, temps, ef0["base_trial_move"],
                    ef0.get("temper_freq", 10),
                    ef0["do_parallel_tempering"], window=window,
                    dtype=dtype, backend=backend, escalate="inline")
            # np.array (copies): np.asarray of a jax array is READ-ONLY
            h_states, h_ll, h_accept = (
                np.array(h) for h in (h_states, h_ll, h_accept))
            ll_host = np.array(ll_host)
            states_h = np.array(states_E)
            att_h = np.array(swap_att)
            acc_h = np.array(swap_acc)
            # host-materialize the window entry state before slicing:
            # eager indexing of a mesh-sharded array dispatches a
            # small-block gather outside jit, which the jax 0.9.0 CPU
            # runtime corrupts the heap on (docs/TPU_NOTES.md gotcha)
            states_in_h = np.asarray(states_in)
            ll_in_h = np.asarray(ll_in)
            for e in np.nonzero(nfail_h)[0]:
                logger.warning(
                    f"Ensemble {e} window {k}-{k + n_this}: "
                    f"{int(nfail_h[e])} diverged solves; re-running with "
                    "inline solver escalation")
                fix = safe_kernel.run_window(
                    jnp.asarray(states_in_h[e], dtype),
                    jnp.asarray(ll_in_h[e], dtype), jnp.asarray(k),
                    base_key, n_this, e0=int(e))
                fstates, fll, fatt, facc, fnf, fhist = fix
                if int(fnf):
                    logger.warning(
                        f"Ensemble {e}: {int(fnf)} solves still diverged "
                        "on the refined grid (rejected as -inf)")
                states_h[e] = np.asarray(fstates)
                ll_host[e] = np.asarray(fll)
                att_h[e] = np.asarray(fatt)
                acc_h[e] = np.asarray(facc)
                h_states[:, e] = np.asarray(fhist[0])
                h_ll[:, e] = np.asarray(fhist[1])
                h_accept[:, e] = np.asarray(fhist[2])
            # carry the repaired states/ll back into the sharded layout
            states_E = jax.device_put(jnp.asarray(states_h, dtype),
                                      kernel.state_sharding)
            ll_E = jax.device_put(jnp.asarray(ll_host, dtype),
                                  kernel.state_sharding)
            swap_att, swap_acc = att_h, acc_h
            esc_streak += 1
            if esc_streak >= 3:
                # persistent escalation (tempered hot chains): run the
                # whole mesh through the inline-escalation shard_map
                # kernel instead of serial per-ensemble re-runs
                logger.info(
                    "3 consecutive windows needed escalation; switching "
                    "to the inline-escalation sharded kernel")
                kernel = _build("inline")
                inline_mode = True
        else:
            esc_streak = 0
        dt_win = perf_counter() - t_win
        logger.info(
            f"Window of {n_this} iters x {E} ensembles took {dt_win:.3f} s "
            f"({n_this * K * E / max(dt_win, 1e-9):.1f} "
            "aggregate walker-steps/s)")
        for e, ens in enumerate(ensembles):
            H = ens.H
            H.states[:, :, k:k + n_this] = (
                h_states[:n_this, e].transpose(1, 2, 0))
            H.loglikelihood[:, k:k + n_this] = h_ll[:n_this, e].T
            H.accept[:, k:k + n_this] = h_accept[:n_this, e].T
            H.swap_attempts += np.asarray(swap_att[e])
            H.swap_accept += np.asarray(swap_acc[e])
            ens.latest_iter = k + n_this
            ens._carried_ll = ll_host[e]
        k += n_this
        if k < num_iters:
            logger.info(f"Saving checkpoints at k={k}")
            for ens, ep in zip(ensembles, export_paths):
                ens.checkpoint(os.path.join(
                    ens.ensemble_fields["output_path"], ep))
        if k % MSG_FREQ < window:
            for e, ens in enumerate(ensembles):
                for m in range(K):
                    logger.info(
                        f"Iter {k} ensemble {e} chain {m} state: "
                        f"{ens.H.states[m, :, k - 1]} "
                        f"logll {ens.H.loglikelihood[m, k - 1]}")

    logger.info(f"Total sharded walk ({E} ensembles, {d_e}x{d_c} mesh) "
                f"took {perf_counter() - clock0} s")
    for ens, ep in zip(ensembles, export_paths):
        with np.errstate(divide="ignore", invalid="ignore"):
            rate = (100 * ens.H.swap_accept[:-1]
                    / np.maximum(ens.H.swap_attempts[:-1], 1))
        logger.info(
            f"Swap accept rate: {ens.H.swap_accept} accepted of "
            f"{ens.H.swap_attempts} attempts ({rate} %)")
        ens.checkpoint(os.path.join(
            ens.ensemble_fields["output_path"], ep))
    return ensembles


def kill_from_cl(signal_n, frame):
    raise KeyboardInterrupt("Terminate from command line")


def all_signal_handler(func):
    """Trap termination signals to ``func`` so SLURM/driver kills become
    clean KeyboardInterrupts (reference metropolis.py:270-280 traps EVERY
    signal, including SIGCHLD — which fires whenever any child process
    exits, e.g. the GUI quicksim worker, and would kill the walk; we trap
    only genuine termination signals)."""
    names = ("SIGINT", "SIGTERM", "SIGHUP", "SIGQUIT", "SIGUSR1", "SIGUSR2")
    for name in names:
        s = getattr(signal, name, None)
        if s is None:
            continue
        try:
            signal.signal(s, func)
        except (ValueError, OSError):
            continue


def run_mh(ensemble, like_plan, move_plan, logger, seed=235817049752375780,
           export_path="", dtype=jnp.float64, shard_batch=None,
           starting_iter=0, need_initial_state=True, profile_dir=None,
           backend="xla", escalate=True):
    """Host driver: windows of compiled iterations with checkpointing
    (reference metro() loop structure, metropolis.py:373-463).

    ensemble : io.ensemble.Ensemble (mutated in place: H, latest_iter).
    escalate : True (default) = deferred escalation — the hot loop runs
        without the in-eval retry (whose lax.cond costs ~10 ms/call on TPU
        even when idle), and any window reporting solver failures is
        re-run through an "inline" kernel that retries non-finite solves
        on the refined grid (reference converge_simulation semantics,
        trial_move_evaluation.py:168-210). "inline" = always use the
        retrying kernel; False = never retry (failures auto-reject).
    """
    ef = ensemble.ensemble_fields
    num_iters = ef["num_iters"]
    checkpoint_freq = ef.get("checkpoint_freq") or num_iters
    temps = np.asarray(ef["_T"], dtype=float)
    K = len(temps)
    clock0 = perf_counter()

    ef["_rng_seed"] = seed
    base_key = jax.random.PRNGKey(seed % (2 ** 63))

    H = ensemble.H
    states = jnp.asarray(H.states[:, :, max(starting_iter - 1, 0)].copy(),
                         dtype)
    if need_initial_state:
        logger.info("Simulating initial state:")

    window = _even_window(num_iters - max(1, starting_iter) + 1,
                          checkpoint_freq)

    def _build(esc_mode):
        return build_mh_kernel(
            like_plan, move_plan, temps, ef["base_trial_move"],
            ef.get("temper_freq", 10), ef["do_parallel_tempering"],
            window=window, dtype=dtype, shard_batch=shard_batch,
            backend=backend, escalate=esc_mode)

    kernel = _build("inline" if escalate == "inline" else "off")
    safe_kernel = kernel if escalate == "inline" else None
    esc_streak = 0   # consecutive windows that needed an escalation re-run

    carried = (None if need_initial_state
               else _restore_carried_ll([ensemble], K))
    ll_T = (kernel.init_ll(states) if carried is None
            else jnp.asarray(carried[0], dtype))
    if need_initial_state:
        H.loglikelihood[:, 0] = np.asarray(
            jnp.take_along_axis(ll_T, jnp.arange(K)[:, None], axis=1))[:, 0]
        starting_iter = 1

    k = starting_iter
    profiled = False
    while k < num_iters:
        n_this = min(window, num_iters - k)
        logger.info(f"Simulating from {k} to {k + n_this}")
        t_win = perf_counter()
        states_in, ll_in = states, ll_T
        if profile_dir and not profiled:
            # device trace of one compiled window (superset of the
            # reference's wall-clock accumulators, SURVEY.md section 5)
            with jax.profiler.trace(profile_dir):
                out = kernel.run_window(
                    states, ll_T, jnp.asarray(k), base_key, n_this)
                jax.block_until_ready(out[0])
            profiled = True
            logger.info(f"Profiler trace written to {profile_dir}")
        else:
            out = kernel.run_window(states, ll_T, jnp.asarray(k), base_key,
                                    n_this)
        states, ll_T, swap_att, swap_acc, nfail, hist = out
        jax.block_until_ready(states)
        if int(nfail) and escalate is True and kernel is not safe_kernel:
            # deferred escalation: the window saw diverged solves (rejected
            # as -inf). Re-run it from the SAME entry state/keys through
            # the inline-retry kernel — a pure function of (state, ll, k,
            # key), so the re-run exactly reproduces the window with the
            # retries applied.
            logger.warning(
                f"Window {k}-{k + n_this}: {int(nfail)} diverged solves; "
                "re-running window with inline solver escalation")
            if safe_kernel is None:
                safe_kernel = _build("inline")
            states, ll_T, swap_att, swap_acc, nfail, hist = (
                safe_kernel.run_window(states_in, ll_in, jnp.asarray(k),
                                       base_key, n_this))
            jax.block_until_ready(states)
            if int(nfail):
                logger.warning(
                    f"{int(nfail)} solves still diverged on the refined "
                    "grid (rejected as -inf)")
            esc_streak += 1
            if esc_streak >= 3:
                # persistent escalation (typical of tempered runs: hot
                # chains roam states that keep tripping the Newton
                # predicate) — stop double-running windows and use the
                # inline-retry kernel directly from here on
                logger.info(
                    "3 consecutive windows needed escalation; switching "
                    "to the inline-escalation kernel for the remainder")
                kernel = safe_kernel
        else:
            esc_streak = 0
        logger.info(
            f"Window of {n_this} iters took {perf_counter() - t_win:.3f} s "
            f"({n_this * K / max(perf_counter() - t_win, 1e-9):.1f} "
            "walker-steps/s)")
        h_states, h_ll, h_accept = (np.asarray(h) for h in hist)
        # scan emits `window` iterations; keep the first n_this
        H.states[:, :, k:k + n_this] = h_states[:n_this].transpose(1, 2, 0)
        H.loglikelihood[:, k:k + n_this] = h_ll[:n_this].T
        H.accept[:, k:k + n_this] = h_accept[:n_this].T
        H.swap_attempts += np.asarray(swap_att)
        H.swap_accept += np.asarray(swap_acc)
        k += n_this
        ensemble.latest_iter = k
        ensemble._carried_ll = np.asarray(ll_T)
        if k < num_iters:
            logger.info(f"Saving checkpoint at k={k}")
            ensemble.checkpoint(
                os.path.join(ef["output_path"], export_path))
        if k % MSG_FREQ < window:
            for m in range(K):
                logger.info(
                    f"Iter {k} chain {m} state: {H.states[m, :, k - 1]} "
                    f"logll {H.loglikelihood[m, k - 1]}")

    with np.errstate(divide="ignore", invalid="ignore"):
        rate = 100 * H.swap_accept[:-1] / np.maximum(H.swap_attempts[:-1], 1)
    logger.info(
        f"Swap accept rate: {H.swap_accept} accepted of "
        f"{H.swap_attempts} attempts ({rate} %)")
    logger.info(f"Total walk took {perf_counter() - clock0} s")
    ensemble.checkpoint(os.path.join(ef["output_path"], export_path))
    return ensemble


def _resolve_ckpt_paths(load_ckpt, n):
    """Per-replica checkpoint filenames for a multi-ensemble resume: a
    list/tuple of n names, or a '{e}' template (e.g. 'CPU{e}-final.pik' —
    the fused/sharded drivers' own export naming)."""
    if isinstance(load_ckpt, (list, tuple)):
        if len(load_ckpt) != n:
            raise ValueError(
                f"load_checkpoint lists {len(load_ckpt)} files for "
                f"{n} ensembles")
        return list(load_ckpt)
    if n == 1:
        return [load_ckpt]
    paths = [load_ckpt.format(e=e) for e in range(n)]
    if len(set(paths)) != n:
        raise ValueError(
            "resuming n_ensembles > 1 needs per-replica checkpoints: pass "
            "load_checkpoint as a list or a '{e}' template, e.g. "
            "'CPU{e}-final.pik'")
    return paths


def _resume_starting_iter(ensembles, MCMC_fields, num_iters):
    """Rewind/extend loaded checkpoints to continue to ``num_iters``;
    returns the starting iteration (reference metropolis.py:342-353
    semantics). Handles the reference's two broken edges: a rewind past
    which the walk continues (index-out-of-bounds there) and a num_iters
    below the checkpoint's progress (clean truncation + no-op here).
    Multi-replica: lockstep drivers checkpoint together, but an interrupt
    can leave replicas a window apart — restart all from the minimum."""
    latest = min(ens.latest_iter for ens in ensembles)
    if ("starting_iter" in MCMC_fields
            and MCMC_fields["starting_iter"] < latest):
        start = MCMC_fields["starting_iter"]
    else:
        start = min(latest, num_iters)
    for ens in ensembles:
        if start != ens.latest_iter:
            # rewound (or lockstep-misaligned) resume: the checkpointed
            # carried ll belongs to a later state — stale, recompute
            ens._carried_ll = None
        # drop history past start, then grow to the new total; keep the
        # progress marker consistent so an interrupt before the first new
        # window completes never checkpoints zeroed rows as walked
        ens.H.extend(start)
        ens.H.extend(num_iters)
        ens.ensemble_fields["num_iters"] = num_iters
        ens.latest_iter = start
    return start


def metro(sim_info, iniPar, e_data, MCMC_fields, param_info, verbose=False,
          export_path="", **kwargs):
    """Top-level MH inference entry point (reference metropolis.py:283
    signature). Builds plans from parsed config + data, runs the walk,
    writes GUI-loadable checkpoints.

    kwargs['n_ensembles'] > 1 runs that many independent replicas of the
    walk (reference multi-jobid semantics, main.py:36) fused through one
    compiled kernel (:func:`run_mh_fused`) — the TPU aggregate-throughput
    optimum. Each replica gets seed+e and its own `CPU{e}-final.pik`
    checkpoint; returns the list of ensembles. Resume any run shape by
    passing load_checkpoint as a '{e}' template or list of per-replica
    files (reference metropolis.py:342-353 resumes one rank's pickle; the
    fused/sharded drivers write one per replica).

    kwargs['mesh_shape'] = (d_e, d_c) runs the multi-chip production
    driver (:func:`run_mh_sharded`): the SAME walk shard_map-partitioned
    over a (ensembles x chains) device mesh — the TPU-native equivalent
    of the reference's one-chain-per-MPI-rank mode (metropolis.py:400-453)
    — with the full host feature set (History, windowed checkpoints,
    deferred escalation, bit-exact resume)."""
    from metrotrpl_tpu.config.data_io import make_dir
    from metrotrpl_tpu.io.ensemble import Ensemble, load_checkpoint
    from metrotrpl_tpu.io.logging import start_logging, stop_logging
    from metrotrpl_tpu.ops.convolve import load_irf_tables

    # enable x64 for the f64-emulated escalation rung (the fine-grid
    # nx>=96 repair path, build_likelihood_plan): the walk itself stays
    # f32 on accelerators (dtype policy below) — x64 only gates whether
    # the flagged-row re-solve can run in emulated float64, which is what
    # lets the flagship walk cover the stiff high-mobility ridge arm the
    # f32 solver cannot (scripts/probe_r14_ridge64.py). The Pallas hot
    # kernel traces with 32-bit canonicalization regardless
    # (solver/pallas_step.py x64 scope). Opt out with use_x64=False.
    if kwargs.get("use_x64", True) and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    from metrotrpl_tpu import enable_compile_cache
    enable_compile_cache()

    make_dir(MCMC_fields["output_path"])
    logger, handler = start_logging(
        log_dir=MCMC_fields["output_path"],
        name=kwargs.get("logger_name", "Ensemble0"), verbose=verbose)

    # trap signals for clean termination with a final checkpoint
    # (reference metropolis.py:288-289)
    if kwargs.get("trap_signals", True):
        all_signal_handler(kill_from_cl)

    load_ckpt = MCMC_fields.get("load_checkpoint", None)
    num_iters = MCMC_fields["num_iters"]
    n_ensembles = int(kwargs.get("n_ensembles", 1))
    mesh_shape = kwargs.get("mesh_shape")
    starting_iter = 0
    if load_ckpt is None:
        ensembles = [Ensemble(param_info, sim_info, MCMC_fields, num_iters,
                              verbose) for _ in range(n_ensembles)]
        need_initial_state = True
    else:
        ensembles = [
            load_checkpoint(os.path.join(MCMC_fields["output_path"], p))
            for p in _resolve_ckpt_paths(load_ckpt, n_ensembles)]
        starting_iter = _resume_starting_iter(ensembles, MCMC_fields,
                                              num_iters)
        need_initial_state = False
    ensemble = ensembles[0]

    irf_tables = {}
    if ensemble.ensemble_fields.get("irf_convolution", None) is not None:
        irf_tables = load_irf_tables(
            ensemble.ensemble_fields["irf_convolution"],
            kwargs.get("irf_dir", "IRFs"))
    for ens in ensembles:
        ens_f = ens.ensemble_fields
        ens_f["_init_params"] = iniPar
        ens_f["_times"], ens_f["_vals"], ens_f["_uncs"] = e_data
        ens_f["_IRF_tables"] = irf_tables

    ef = ensemble.ensemble_fields
    for i, unc in enumerate(ef["_uncs"]):
        logger.info(f"{i} exp unc max: {np.amax(unc)} avg: {np.mean(unc)}")

    mcmc_for_plan = dict(MCMC_fields)
    mcmc_for_plan.setdefault("model_uncertainty",
                             ensemble.unique_fields[0].get(
                                 "model_uncertainty"))
    refine = kwargs.get("refine")
    if refine is None:
        # honor the config's LSODA-style tolerances via the measured
        # accuracy model (solver/forward.py:refine_for_tols)
        from metrotrpl_tpu.solver.forward import refine_for_tols
        n_steps_est = max(
            (len(t) for t in e_data[0]), default=500)
        refine = refine_for_tols(
            MCMC_fields.get("rtol"), MCMC_fields.get("atol"),
            n_steps=n_steps_est, logger=logger)
    escalate = kwargs.get("escalate", True)
    # shared `Solver name: sdirk` fast-mode policy (resolve_solver_mode
    # docstring; accuracy/validation: docs/TPU_NOTES.md round-3 table)
    hmax_kw, align_outputs = resolve_solver_mode(
        MCMC_fields, 4.0, kwargs.get("hmax"), kwargs.get("align_outputs"))
    if not align_outputs:
        logger.info(f"sdirk fast mode: decoupled step grid, hmax={hmax_kw}")
    like_plan = build_likelihood_plan(
        sim_info, param_info, mcmc_for_plan, e_data, iniPar,
        irf_tables=irf_tables,
        scheme=kwargs.get("scheme", "sdirk3"),
        newton_iters=kwargs.get("newton_iters", 2),
        hmax=hmax_kw, align_outputs=align_outputs,
        refactor_every=int(kwargs.get("refactor_every")
                           or MCMC_fields.get("refactor_every", 1)),
        ramp_block=int(kwargs.get("ramp_block")
                       or MCMC_fields.get("ramp_block", 1)),
        newton_plateau=(lambda v: None if v is None else int(v))(
            kwargs.get("newton_plateau",
                       MCMC_fields.get("newton_plateau"))),
        newton_div_tol=kwargs.get("newton_div_tol"),
        # the refined-grid plan is needed whenever any escalation mode is
        # on (the deferred re-run kernel uses it)
        refine=refine, escalate=bool(escalate))
    move_plan = build_move_plan(param_info, MCMC_fields)

    logger.info(f"Sim info: {sim_info}")
    seed = kwargs.get("seed")
    if seed is None:
        # resume continues the checkpoint's stream unless overridden
        seed = ((ef.get("_rng_seed") if load_ckpt is not None else None)
                or 235817049752375780)
    dtype = kwargs.get("dtype")
    if dtype is None:
        # float32 on accelerators (float64 is emulated/truncated on TPU);
        # float64 on CPU where the oracle-grade precision is free
        dtype = (jnp.float64 if jax.default_backend() == "cpu"
                 and jax.config.jax_enable_x64 else jnp.float32)
    logger.info(f"Walk dtype: {np.dtype(dtype).name}")
    backend_kw = kwargs.get("backend", "auto")

    if n_ensembles == 1:
        export_paths = kwargs.get("export_paths") or [export_path]
    else:
        export_paths = (kwargs.get("export_paths")
                        or [f"CPU{e}-final.pik" for e in
                            range(n_ensembles)])
    try:
        if mesh_shape is not None:
            if kwargs.get("seeds"):
                logger.warning(
                    "sharded runs use ONE shared seed (ensembles derive "
                    "streams by fold_in); ignoring seeds")
            if kwargs.get("shard_batch"):
                logger.warning("shard_batch is ignored with mesh_shape "
                               "(partitioning is structural)")
            run_mh_sharded(ensembles, like_plan, move_plan, logger,
                           seed=seed, mesh_shape=tuple(mesh_shape),
                           export_paths=export_paths, dtype=dtype,
                           starting_iter=starting_iter,
                           need_initial_state=need_initial_state,
                           backend=backend_kw, escalate=escalate,
                           devices=kwargs.get("devices"),
                           profile_dir=kwargs.get("profile_dir"))
        elif n_ensembles > 1:
            for ignored in ("profile_dir", "shard_batch"):
                if kwargs.get(ignored):
                    logger.warning(
                        f"{ignored} is not supported with n_ensembles > 1 "
                        "and will be ignored")
            seeds = kwargs.get("seeds")
            if seeds is None:
                if load_ckpt is not None:
                    seeds = [ens.ensemble_fields.get("_rng_seed", seed + e)
                             for e, ens in enumerate(ensembles)]
                else:
                    seeds = [seed + e for e in range(n_ensembles)]
            run_mh_fused(ensembles, like_plan, move_plan, logger,
                         seeds=seeds, export_paths=export_paths,
                         dtype=dtype, starting_iter=starting_iter,
                         need_initial_state=need_initial_state,
                         backend=backend_kw, escalate=escalate)
        else:
            run_mh(ensemble, like_plan, move_plan, logger, seed=seed,
                   export_path=export_path, dtype=dtype,
                   shard_batch=kwargs.get("shard_batch"),
                   starting_iter=starting_iter,
                   need_initial_state=need_initial_state,
                   profile_dir=kwargs.get("profile_dir"),
                   backend=backend_kw,
                   escalate=escalate)
    except KeyboardInterrupt:
        # clean termination: keep completed iterations, checkpoint, exit
        logger.warning(
            f"Interrupted at iteration {ensemble.latest_iter}; truncating "
            "histories and writing final checkpoints")
        for ens, ep in zip(ensembles, export_paths):
            ens.H.truncate(max(ens.latest_iter, 1))
            ens.checkpoint(os.path.join(
                ens.ensemble_fields["output_path"], ep))
        stop_logging(logger, handler, 1)
        return ensembles if n_ensembles > 1 else ensemble
    stop_logging(logger, handler, 0)
    return ensembles if n_ensembles > 1 else ensemble
