"""Trial move proposal and prior/physics screening.

Vectorized re-design of the reference's proposal loop (reference
trial_move_generation.py:4-97): log-space uniform displacement, optional
ambipolar-mobility constraint, and the prior screen (bounds, p0 > n0,
|log tauN - log tauP| <= 2). With hard_bounds the reference retries up to
MAX_PROPOSALS times to find an in-bounds proposal and otherwise keeps the
last (possibly failing) draw — reproduced here as a bounded
``lax.while_loop``, which also matches the subtle behavior that an
out-of-bounds proposal IS still evaluated if all retries fail.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from metrotrpl_tpu.constants import MAX_PROPOSALS


class MovePlan(NamedTuple):
    do_log: np.ndarray       # (P,) bool
    active: np.ndarray       # (P,) bool
    trial_move: np.ndarray   # (P,) base widths, 0 for inactive params
    lb: np.ndarray           # (P,) prior lower bounds (entry units)
    ub: np.ndarray           # (P,)
    p0_idx: int              # -1 if absent
    n0_idx: int
    taun_idx: int
    taup_idx: int
    mu_n_idx: int
    mu_p_idx: int
    mu_constraint: Optional[tuple]   # (center, width) or None
    hard_bounds: bool
    max_proposals: int


def build_move_plan(param_info, MCMC_fields):
    names = list(param_info["names"])
    idx = {n: i for i, n in enumerate(names)}
    active = np.array([bool(param_info["active"][n]) for n in names])
    do_log = np.array([bool(param_info["do_log"][n]) for n in names])
    trial_move = np.array([
        param_info["trial_move"][n] if param_info["active"][n] else 0.0
        for n in names])
    lb = np.array([param_info["prior_dist"][n][0] for n in names])
    ub = np.array([param_info["prior_dist"][n][1] for n in names])
    mu_c = param_info.get("do_mu_constraint",
                          MCMC_fields.get("do_mu_constraint", None))
    if mu_c is not None:
        # The ambipolar substitution works in log10 space (as does the
        # reference, trial_move_generation.py:83-85); applying it to a
        # linear-space mobility would silently corrupt proposals.
        for mn in ("mu_n", "mu_p"):
            if mn in idx and not do_log[idx[mn]]:
                raise ValueError(
                    f"do_mu_constraint requires do_log[{mn}]=1 (the "
                    "ambipolar substitution operates on log10 mobilities)")
    return MovePlan(
        do_log=do_log,
        active=active,
        trial_move=trial_move,
        lb=lb,
        ub=ub,
        p0_idx=idx.get("p0", -1),
        n0_idx=idx.get("n0", -1),
        taun_idx=idx.get("tauN", -1),
        taup_idx=idx.get("tauP", -1),
        mu_n_idx=idx.get("mu_n", -1),
        mu_p_idx=idx.get("mu_p", -1),
        mu_constraint=tuple(mu_c) if mu_c is not None else None,
        hard_bounds=bool(MCMC_fields.get("hard_bounds", 0)),
        max_proposals=MAX_PROPOSALS,
    )


def approve_move(new_state_t, plan):
    """Vectorized prior screen on a state in MOVE space (log10 for do_log
    params). Returns a scalar bool: True if every check passes."""
    do_log = jnp.asarray(plan.do_log)
    active = jnp.asarray(plan.active)
    raw = jnp.where(do_log, 10.0 ** new_state_t, new_state_t)
    in_bounds = (jnp.asarray(plan.lb) < raw) & (raw < jnp.asarray(plan.ub))
    ok = jnp.all(jnp.where(active, in_bounds, True))

    if plan.p0_idx >= 0 and plan.n0_idx >= 0:
        # compared in move space, like the reference
        # (trial_move_generation.py:25-26)
        ok = ok & (new_state_t[plan.p0_idx] > new_state_t[plan.n0_idx])

    if plan.taun_idx >= 0 and plan.taup_idx >= 0:
        # do_log is static, so branch in Python (avoids log of log-space vals)
        tn = new_state_t[plan.taun_idx]
        tp = new_state_t[plan.taup_idx]
        logtn = tn if plan.do_log[plan.taun_idx] else jnp.log10(tn)
        logtp = tp if plan.do_log[plan.taup_idx] else jnp.log10(tp)
        ok = ok & (jnp.abs(logtn - logtp) <= 2.0)
    return ok


def approve_move_report(new_state, param_info):
    """Host-side named-check variant (diagnostics parity with the
    reference's failed_checks list)."""
    names = list(param_info["names"])
    do_log = np.array([bool(param_info["do_log"][n]) for n in names])
    raw = np.where(do_log, 10.0 ** np.asarray(new_state, dtype=float),
                   new_state)
    checks = {}
    for i, n in enumerate(names):
        if not param_info["active"][n]:
            continue
        lo, hi = param_info["prior_dist"][n]
        checks[f"{n}_size"] = bool(lo < raw[i] < hi)
    if "p0" in names and "n0" in names:
        checks["p0_greater"] = bool(
            new_state[names.index("p0")] > new_state[names.index("n0")])
    else:
        checks["p0_greater"] = True
    if "tauN" in names and "tauP" in names:
        tn = new_state[names.index("tauN")]
        tp = new_state[names.index("tauP")]
        ltn = tn if param_info["do_log"]["tauN"] else np.log10(tn)
        ltp = tp if param_info["do_log"]["tauP"] else np.log10(tp)
        checks["tn_tp_close"] = bool(abs(ltn - ltp) <= 2)
    else:
        checks["tn_tp_close"] = True
    return [k for k, v in checks.items() if not v]


def make_trial_move(state, move_width, key, plan):
    """Propose a new state: current + uniform displacement of half-width
    ``move_width`` (per-parameter, already temperature-scaled) in move space.

    With hard_bounds, redraws up to max_proposals times until the screen
    passes; the last draw is kept either way (reference behavior).
    Returns the proposal in entry units.
    """
    do_log = jnp.asarray(plan.do_log)
    x = jnp.where(do_log, jnp.log10(state), state)
    max_tries = plan.max_proposals if plan.hard_bounds else 1

    moved = move_width > 0

    def draw(key):
        key, k1, k2 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, x.shape, dtype=x.dtype)
        new = x + move_width * (2.0 * u - 1.0)
        if plan.mu_constraint is not None:
            ambi, width = plan.mu_constraint
            muambi = jax.random.uniform(
                k2, (), dtype=x.dtype,
                minval=ambi - width, maxval=ambi + width)
            # mu_p from the ambipolar relation 2/mu_ambi = 1/mu_n + 1/mu_p
            # (reference trial_move_generation.py:79-85)
            mu_p = 1.0 / (2.0 / muambi - 1.0 / 10.0 ** new[plan.mu_n_idx])
            new = new.at[plan.mu_p_idx].set(jnp.log10(mu_p))
        return key, new

    key, new = draw(key)
    ok = approve_move(new, plan)

    if max_tries > 1:
        def cond(c):
            key, new, ok, tries = c
            return (~ok) & (tries < max_tries)

        def body(c):
            key, _, _, tries = c
            key, new = draw(key)
            return key, new, approve_move(new, plan), tries + 1

        key, new, ok, _ = jax.lax.while_loop(
            cond, body, (key, new, ok, jnp.asarray(1)))

    out = jnp.where(do_log, 10.0 ** new, new)
    if plan.mu_constraint is not None:
        moved = moved | (jnp.arange(len(plan.do_log)) == plan.mu_p_idx)
    # Zero-width (frozen) parameters keep their EXACT state value. Routing
    # them through the 10^(log10(s)) roundtrip is not an identity: on TPU
    # f32 the pow/log approximations have a value-dependent systematic bias
    # of ~1e-5..3e-5 per application (no fixpoint within hundreds of
    # iterations), so every accepted move would silently walk every frozen
    # parameter away from its configured value — measured -1.7% on p0 after
    # 2000 iterations, which in turn biased the ACTIVE-parameter posterior
    # by +1.6 sigma on the staub ks (round-2 TPU posterior debugging).
    return jnp.where(moved, out, state)
