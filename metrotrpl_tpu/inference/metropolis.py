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
* RNG is a keyed stream: iteration k derives fold_in(base_key, k), which
  is split into proposal/acceptance/swap keys and the proposal key split
  per chain. Resume-from-checkpoint is bit-exact by
  construction (no generator state to restore). This intentionally departs
  from the reference's shared-Generator scheme, where all MPI ranks draw
  IDENTICAL random numbers each iteration (metropolis.py:296,410-411) —
  i.e. correlated chains; our chains draw independently.
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
from metrotrpl_tpu.inference.moves import build_move_plan, make_trial_move


class MHKernel(NamedTuple):
    """Compiled window runner + static run info."""
    run_window: callable      # (states, ll_T, k0, key) ->
                              # (states, ll_T, swap_att, swap_acc, nfail, hist)
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
    own = jnp.arange(K)

    def eval_states(states):
        if shard_batch is not None:
            states = shard_batch(states)
        r = eval_logll(states, temps_j)
        return r["logll_T"], r["n_solver_fail"]       # (K, K), ()

    def propose(states, key):
        keys = jax.random.split(key, K)
        return jax.vmap(
            lambda s, w, k: make_trial_move(s, w, k, move_plan)
        )(states, widths, keys)

    def swap_round(carry, key):
        """(n_chains - 1) sequential random adjacent-pair swap attempts
        (reference metropolis.py:204-261 math)."""
        states, ll_T, swap_att, swap_acc = carry

        def body(j, c):
            states, ll_T, swap_att, swap_acc, key = c
            key, k1, k2 = jax.random.split(key, 3)
            i = jax.random.randint(k1, (), 0, K - 1)
            bi_ui = ll_T[i, i]
            bj_uj = ll_T[i + 1, i + 1]
            bi_uj = ll_T[i + 1, i]
            bj_ui = ll_T[i, i + 1]
            logratio = bi_ui + bj_uj - bi_uj - bj_ui
            accept = jax.random.uniform(k2, (), dtype) < jnp.exp(-logratio)
            perm = own.at[i].set(jnp.where(accept, i + 1, i))
            perm = perm.at[i + 1].set(jnp.where(accept, i, i + 1))
            states = states[perm]
            ll_T = ll_T[perm]
            swap_att = swap_att.at[i].add(1)
            swap_acc = swap_acc.at[i].add(accept.astype(swap_acc.dtype))
            return states, ll_T, swap_att, swap_acc, key

        states, ll_T, swap_att, swap_acc, _ = jax.lax.fori_loop(
            0, K - 1, body, (states, ll_T, swap_att, swap_acc, key))
        return states, ll_T, swap_att, swap_acc

    def one_iter(carry, k):
        states, ll_T, swap_att, swap_acc, nfail, base_key = carry
        key_iter = jax.random.fold_in(base_key, k)
        k_prop, k_acc, k_swap = jax.random.split(key_iter, 3)

        new_states = propose(states, k_prop)
        new_ll_T, nf = eval_states(new_states)
        nfail = nfail + nf

        logratio = (jnp.take_along_axis(new_ll_T, own[:, None], axis=1)
                    - jnp.take_along_axis(ll_T, own[:, None], axis=1))[:, 0]
        logratio = jnp.where(jnp.isnan(logratio), -jnp.inf, logratio)
        u = jax.random.uniform(k_acc, (K,), dtype)
        accept = u < jnp.exp(logratio)

        states = jnp.where(accept[:, None], new_states, states)
        ll_T = jnp.where(accept[:, None], new_ll_T, ll_T)

        if do_tempering:
            do_swap = (k % temper_freq) == 0
            states, ll_T, swap_att, swap_acc = jax.lax.cond(
                do_swap,
                lambda c: swap_round(c, k_swap),
                lambda c: c,
                (states, ll_T, swap_att, swap_acc))

        ll_own = jnp.take_along_axis(ll_T, own[:, None], axis=1)[:, 0]
        return ((states, ll_T, swap_att, swap_acc, nfail, base_key),
                (states, ll_own, accept))

    @jax.jit
    def run_window(states, ll_T, k0, base_key):
        swap_att = jnp.zeros(K, dtype=jnp.int32)
        swap_acc = jnp.zeros(K, dtype=jnp.int32)
        nfail = jnp.zeros((), dtype=jnp.int32)
        ks = k0 + jnp.arange(window)
        carry, hist = jax.lax.scan(
            one_iter, (states, ll_T, swap_att, swap_acc, nfail, base_key),
            ks)
        states, ll_T, swap_att, swap_acc, nfail, _ = carry
        return states, ll_T, swap_att, swap_acc, nfail, hist

    @jax.jit
    def init_ll(states):
        return eval_states(states)[0]

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
    return kernel._replace(
        run_window=jax.jit(jax.vmap(kernel.run_window,
                                    in_axes=(0, 0, None, 0))),
        init_ll=jax.jit(jax.vmap(kernel.init_ll)),
    )


def run_ensembles_sequential(kernel, states_E, ll_E, k0, keys_E):
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
    outs = [kernel.run_window(states_E[e], ll_E[e], k0, keys_E[e])
            for e in range(states_E.shape[0])]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *outs)


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

    ll_E = kernel.init_ll(states_E)
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
        out = kernel.run_window(states_E, ll_E, jnp.asarray(k), keys_E)
        states_E, ll_E, swap_att, swap_acc, nfail, hist = out
        jax.block_until_ready(states_E)
        nfail_h = np.asarray(nfail)
        if nfail_h.any() and escalate is True:
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
                    states_in[e], ll_in[e], jnp.asarray(k), keys_E[e])
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
        dt_win = perf_counter() - t_win
        logger.info(
            f"Window of {n_this} iters x {E} ensembles took {dt_win:.3f} s "
            f"({n_this * K * E / max(dt_win, 1e-9):.1f} "
            "aggregate walker-steps/s)")
        h_states, h_ll, h_accept = (np.asarray(h) for h in hist)
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

    ll_T = kernel.init_ll(states)
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
                    states, ll_T, jnp.asarray(k), base_key)
                jax.block_until_ready(out[0])
            profiled = True
            logger.info(f"Profiler trace written to {profile_dir}")
        else:
            out = kernel.run_window(states, ll_T, jnp.asarray(k), base_key)
        states, ll_T, swap_att, swap_acc, nfail, hist = out
        jax.block_until_ready(states)
        if int(nfail) and escalate is True:
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
                                       base_key))
            jax.block_until_ready(states)
            if int(nfail):
                logger.warning(
                    f"{int(nfail)} solves still diverged on the refined "
                    "grid (rejected as -inf)")
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


def metro(sim_info, iniPar, e_data, MCMC_fields, param_info, verbose=False,
          export_path="", **kwargs):
    """Top-level MH inference entry point (reference metropolis.py:283
    signature). Builds plans from parsed config + data, runs the walk,
    writes GUI-loadable checkpoints.

    kwargs['n_ensembles'] > 1 runs that many independent replicas of the
    walk (reference multi-jobid semantics, main.py:36) fused through one
    compiled kernel (:func:`run_mh_fused`) — the TPU aggregate-throughput
    optimum. Each replica gets seed+e and its own `CPU{e}-final.pik`
    checkpoint; returns the list of ensembles. Resuming a fused run from
    checkpoints is not supported (start fresh or resume replicas
    individually with n_ensembles=1)."""
    from metrotrpl_tpu.config.data_io import make_dir
    from metrotrpl_tpu.io.ensemble import Ensemble, load_checkpoint
    from metrotrpl_tpu.io.logging import start_logging, stop_logging
    from metrotrpl_tpu.ops.convolve import load_irf_tables

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
    if n_ensembles > 1 and load_ckpt is not None:
        raise ValueError(
            "n_ensembles > 1 cannot resume from a checkpoint; rerun each "
            "replica individually (n_ensembles=1, load_checkpoint=...)")
    starting_iter = 0
    if load_ckpt is None:
        ensemble = Ensemble(param_info, sim_info, MCMC_fields, num_iters,
                            verbose)
        need_initial_state = True
    else:
        ensemble = load_checkpoint(
            os.path.join(MCMC_fields["output_path"], load_ckpt))
        if ("starting_iter" in MCMC_fields
                and MCMC_fields["starting_iter"] < ensemble.latest_iter):
            starting_iter = MCMC_fields["starting_iter"]
            # rewind: drop history past starting_iter, then grow to the new
            # total. (The reference stops at the truncation and would index
            # out of bounds when the walk continues past it —
            # metropolis.py:346-348; fixed here.)
            ensemble.H.extend(starting_iter)
            ensemble.H.extend(num_iters)
            ensemble.ensemble_fields["num_iters"] = num_iters
            # Keep the progress marker consistent with the rewound history:
            # an interrupt before the first new window completes would
            # otherwise checkpoint zeroed rows [starting_iter, old latest)
            # as if they were walked.
            ensemble.latest_iter = starting_iter
        else:
            # A num_iters smaller than the checkpoint's progress truncates
            # the history; the walk then has nothing left to do. Clamping
            # starting_iter keeps the windowed loop a clean no-op instead
            # of indexing past the truncated arrays.
            starting_iter = min(ensemble.latest_iter, num_iters)
            ensemble.H.extend(num_iters)
            ensemble.ensemble_fields["num_iters"] = num_iters
            ensemble.latest_iter = starting_iter
        need_initial_state = False

    ef = ensemble.ensemble_fields
    ef["_init_params"] = iniPar
    ef["_times"], ef["_vals"], ef["_uncs"] = e_data
    for i, unc in enumerate(ef["_uncs"]):
        logger.info(f"{i} exp unc max: {np.amax(unc)} avg: {np.mean(unc)}")

    irf_tables = {}
    if ef.get("irf_convolution", None) is not None:
        irf_tables = load_irf_tables(ef["irf_convolution"],
                                     kwargs.get("irf_dir", "IRFs"))
    ef["_IRF_tables"] = irf_tables

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
        # the refined-grid plan is needed whenever any escalation mode is
        # on (the deferred re-run kernel uses it)
        refine=refine, escalate=bool(escalate))
    move_plan = build_move_plan(param_info, MCMC_fields)

    logger.info(f"Sim info: {sim_info}")
    seed = kwargs.get("seed", 235817049752375780)
    dtype = kwargs.get("dtype")
    if dtype is None:
        # float32 on accelerators (float64 is emulated/truncated on TPU);
        # float64 on CPU where the oracle-grade precision is free
        dtype = (jnp.float64 if jax.default_backend() == "cpu"
                 and jax.config.jax_enable_x64 else jnp.float32)
    logger.info(f"Walk dtype: {np.dtype(dtype).name}")
    backend_kw = kwargs.get("backend", "auto")
    if n_ensembles > 1:
        for ignored in ("profile_dir", "shard_batch"):
            if kwargs.get(ignored):
                logger.warning(
                    f"{ignored} is not supported with n_ensembles > 1 "
                    "and will be ignored")
        ensembles = [ensemble]
        for _ in range(n_ensembles - 1):
            ens_e = Ensemble(param_info, sim_info, MCMC_fields, num_iters,
                             verbose)
            ef_e = ens_e.ensemble_fields
            ef_e["_init_params"] = iniPar
            ef_e["_times"], ef_e["_vals"], ef_e["_uncs"] = e_data
            ef_e["_IRF_tables"] = irf_tables
            ensembles.append(ens_e)
        seeds = kwargs.get("seeds") or [seed + e for e in
                                        range(n_ensembles)]
        export_paths = (kwargs.get("export_paths")
                        or [f"CPU{e}-final.pik" for e in
                            range(n_ensembles)])
        try:
            run_mh_fused(ensembles, like_plan, move_plan, logger,
                         seeds=seeds, export_paths=export_paths,
                         dtype=dtype, starting_iter=starting_iter,
                         need_initial_state=need_initial_state,
                         backend=backend_kw, escalate=escalate)
        except KeyboardInterrupt:
            logger.warning(
                "Interrupted; truncating histories and writing final "
                "checkpoints")
            for ens, ep in zip(ensembles, export_paths):
                ens.H.truncate(max(ens.latest_iter, 1))
                ens.checkpoint(os.path.join(
                    ens.ensemble_fields["output_path"], ep))
            stop_logging(logger, handler, 1)
            return ensembles
        stop_logging(logger, handler, 0)
        return ensembles
    try:
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
            "history and writing final checkpoint")
        ensemble.H.truncate(max(ensemble.latest_iter, 1))
        ensemble.checkpoint(
            os.path.join(ef["output_path"], export_path))
        stop_logging(logger, handler, 1)
        return ensemble
    stop_logging(logger, handler, 0)
    return ensemble
