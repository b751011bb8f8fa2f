"""Shared MH + parallel-tempering window body.

ONE implementation of the (propose -> evaluate -> accept -> swap) iteration
and its ``lax.scan`` window, used by BOTH compiled kernels:

* the single-chip kernel (``inference/metropolis.build_mh_kernel``), and
* the multi-chip ``shard_map`` kernel
  (``parallel/sharded_mh.build_sharded_mh_kernel``),

so the two can never diverge (they previously carried ~150 lines of
near-twin logic each). The body is written DEVICE-LOCAL over an
``(E_l, K_l)`` block of (ensembles x chains); an :class:`MHTopology`
adapter supplies what differs between the two deployments — the block's
global offsets, the gather/scatter used by the tempering swap, and the
global reduction for the diverged-solve counter. The single-chip topology
is the identity (one block holding everything); the mesh topology uses
``lax.axis_index`` offsets, ``lax.all_gather`` over the chains axis, and
``lax.psum``.

RNG discipline (mesh-invariant, both kernels): iteration k derives
``key_iter = fold_in(base_key, k)``, split into proposal/acceptance/swap
subkeys; ensemble e, chain c then draws from
``fold_in(fold_in(subkey, e), c)`` using GLOBAL (e, c) indices, so the
walk is independent of how the block is laid out over devices — the TPU
analogue of the reference's rank-count-independent serial fallback — and
a single-chip run is bit-identical to any sharded layout at the same seed
(tests/test_parallel.py). Resume is bit-exact by construction (no
generator state to restore). This intentionally departs from the
reference's shared-Generator scheme, where all MPI ranks draw IDENTICAL
random numbers each iteration (reference metropolis.py:296,410-411) —
i.e. correlated chains; our chains draw independently.

Tempering swap math (reference metropolis.py:204-261): (K - 1) sequential
random adjacent-pair attempts per round; a swap permutes two rows of the
tiny per-ensemble state/log-likelihood arrays instead of exchanging state
vectors between ranks, using the precomputed (K, K) chains-x-temperatures
log-likelihood matrix instead of re-evaluating ll_funcs.
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from metrotrpl_tpu.inference.moves import make_trial_move


class MHTopology(NamedTuple):
    """How a device-local (E_l, K_l) block maps into the global
    (E, K) ensemble/chain space."""
    E_l: int                 # local ensembles
    K_l: int                 # local chains
    K: int                   # global chains (= temperatures)
    offsets: Callable        # () -> (e0, c0) global offsets of this block
    gather: Callable         # (st_l, ll_l) -> (st_g (E_l,K,P), ll_g (E_l,K,K))
    scatter: Callable        # (st_g, ll_g, att (E_l,K), acc (E_l,K))
    #                          -> (st_l, ll_l, att_l, acc_l)
    psum_fail: Callable      # (E_l,) local fail counts -> (E_l,) summed
    #                          over every device sharing these ensembles


def single_device_topology(E_l, K, e0=0):
    """Identity topology: one block holds all E_l ensembles x K chains.

    e0 : global ensemble offset of the block (may be a traced int32) —
        lets a single-device kernel reproduce ensemble e of a sharded
        run bit-exactly (the keyed RNG folds in GLOBAL ensemble
        indices), which is how the sharded driver re-runs ONE failing
        ensemble through the inline-escalation kernel instead of
        re-running the whole mesh window."""
    return MHTopology(
        E_l=E_l, K_l=K, K=K,
        offsets=lambda: (e0, 0),
        gather=lambda st, ll: (st, ll),
        scatter=lambda st, ll, att, acc: (st, ll, att, acc),
        psum_fail=lambda x: x,
    )


def swap_perm_round(st, ll, key, dtype):
    """One tempering swap round for ONE ensemble: (K - 1) sequential random
    adjacent-pair attempts (reference metropolis.py:204-261 math), applied
    as row permutations of the (K, P) states and (K, K) ll matrix.

    Returns (st, ll, attempts (K,), accepts (K,)) with the per-pair
    counters of THIS round only (callers accumulate)."""
    K = ll.shape[-1]
    own = jnp.arange(K)

    def body(j, c):
        st, ll, att, acc, key = c
        key, k1, k2 = jax.random.split(key, 3)
        i = jax.random.randint(k1, (), 0, K - 1)
        # logratio = b_i(u_i) + b_j(u_j) - b_i(u_j) - b_j(u_i)
        # (reference metropolis.py:214-241)
        logratio = (ll[i, i] + ll[i + 1, i + 1]
                    - ll[i + 1, i] - ll[i, i + 1])
        accept = jax.random.uniform(k2, (), dtype) < jnp.exp(-logratio)
        perm = own.at[i].set(jnp.where(accept, i + 1, i))
        perm = perm.at[i + 1].set(jnp.where(accept, i, i + 1))
        st = st[perm]
        ll = ll[perm]
        att = att.at[i].add(1)
        acc = acc.at[i].add(accept.astype(acc.dtype))
        return st, ll, att, acc, key

    att0 = jnp.zeros(K, jnp.int32)
    acc0 = jnp.zeros(K, jnp.int32)
    st, ll, att, acc, _ = jax.lax.fori_loop(
        0, K - 1, body, (st, ll, att0, acc0, key))
    return st, ll, att, acc


def make_window_body(eval_nf, move_plan, widths, temper_freq, do_tempering,
                     window, dtype, topo):
    """Build the device-local window function.

    eval_nf : (E_l, K_l, P) states -> ((E_l, K_l, K) ll at every
        temperature, (E_l,) int32 diverged-solve count per local
        ensemble). The heavy batched forward solve; constructed by the
        caller (this is where backend / chunking / escalation / sharding
        hints live).
    widths : (K, P) temperature-scaled proposal half-widths (global rows).
    topo : MHTopology.

    Returns window_body(states_l, ll_l, k0, base_key, n_valid) ->
        (states_l, ll_l, swap_att (E_l, K_l), swap_acc (E_l, K_l),
         nfail (E_l,) per-ensemble diverged-solve counts,
         hist=(states, ll_own, accept) stacked over the window).

    n_valid : dynamic int32 — iterations [k0, k0 + n_valid) are real;
        the remaining scan-tail iterations of a partial final window
        (window is a compiled-in static length) are masked to no-ops:
        no accept, no swap, no counter/nfail updates. Without the mask
        the phantom tail advanced the carried states/ll past num_iters
        and inflated the swap counters (History was already sliced to
        the valid prefix by the drivers).
    """
    E_l, K_l = topo.E_l, topo.K_l
    widths_j = jnp.asarray(widths, dtype)

    def window_body(states_l, ll_l, k0, base_key, n_valid):
        e0, c0 = topo.offsets()
        own_cols = c0 + jnp.arange(K_l)       # global temp index per row
        k_end = k0 + n_valid

        def propose(states_l, k_prop):
            def per_row(e, c, s):
                kk = jax.random.fold_in(
                    jax.random.fold_in(k_prop, e0 + e), c0 + c)
                w = jax.lax.dynamic_slice_in_dim(widths_j, c0 + c, 1)[0]
                return make_trial_move(s, w, kk, move_plan)
            return jax.vmap(lambda e, row: jax.vmap(
                lambda c, s: per_row(e, c, s))(jnp.arange(K_l), row)
            )(jnp.arange(E_l), states_l)

        def swap(states_l, ll_l, swap_att, swap_acc, k_swap):
            st_g, ll_g = topo.gather(states_l, ll_l)
            keys_e = jax.vmap(
                lambda e: jax.random.fold_in(k_swap, e0 + e))(
                jnp.arange(E_l))
            st_g, ll_g, att, acc = jax.vmap(
                lambda st, ll, ke: swap_perm_round(st, ll, ke, dtype)
            )(st_g, ll_g, keys_e)
            st_l, ll_l, att_l, acc_l = topo.scatter(st_g, ll_g, att, acc)
            return st_l, ll_l, swap_att + att_l, swap_acc + acc_l

        def one_iter(carry, k):
            states_l, ll_l, swap_att, swap_acc, nfail = carry
            valid = k < k_end
            key_iter = jax.random.fold_in(base_key, k)
            k_prop, k_acc, k_swap = jax.random.split(key_iter, 3)

            new_states = propose(states_l, k_prop)
            new_ll, nf = eval_nf(new_states)     # nf: (E_l,)
            nfail = nfail + jnp.where(valid, nf, 0)

            ll_own_new = jnp.take_along_axis(
                new_ll, own_cols[None, :, None], axis=2)[..., 0]
            ll_own_old = jnp.take_along_axis(
                ll_l, own_cols[None, :, None], axis=2)[..., 0]
            logratio = ll_own_new - ll_own_old
            logratio = jnp.where(jnp.isnan(logratio), -jnp.inf, logratio)

            def acc_key(e, c):
                return jax.random.fold_in(
                    jax.random.fold_in(k_acc, e0 + e), c0 + c)
            u = jax.vmap(lambda e: jax.vmap(
                lambda c: jax.random.uniform(acc_key(e, c), (), dtype)
            )(jnp.arange(K_l)))(jnp.arange(E_l))
            accept = (u < jnp.exp(logratio)) & valid

            states_l = jnp.where(accept[..., None], new_states, states_l)
            ll_l = jnp.where(accept[..., None], new_ll, ll_l)

            if do_tempering:
                states_l, ll_l, swap_att, swap_acc = jax.lax.cond(
                    ((k % temper_freq) == 0) & valid,
                    lambda c: swap(*c, k_swap),
                    lambda c: c,
                    (states_l, ll_l, swap_att, swap_acc))

            ll_own = jnp.take_along_axis(
                ll_l, own_cols[None, :, None], axis=2)[..., 0]
            return ((states_l, ll_l, swap_att, swap_acc, nfail),
                    (states_l, ll_own, accept))

        swap_att = jnp.zeros((E_l, K_l), jnp.int32)
        swap_acc = jnp.zeros((E_l, K_l), jnp.int32)
        nfail0 = jnp.zeros((E_l,), jnp.int32)
        ks = k0 + jnp.arange(window)
        carry, hist = jax.lax.scan(
            one_iter, (states_l, ll_l, swap_att, swap_acc, nfail0), ks)
        states_l, ll_l, swap_att, swap_acc, nfail = carry
        nfail = topo.psum_fail(nfail)
        return states_l, ll_l, swap_att, swap_acc, nfail, hist

    return window_body
