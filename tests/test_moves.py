"""Trial-move proposal and prior-screen tests (reference
test_make_trial_move.py / test_approve_move.py contracts)."""

import jax
import jax.numpy as jnp
import numpy as np

from metrotrpl_tpu.inference.moves import (
    approve_move,
    approve_move_report,
    build_move_plan,
    make_trial_move,
)

NAMES = ["n0", "p0", "tauN", "tauP", "mu_n", "mu_p"]


def _param_info(active=None, do_log=None):
    active = active or {n: 1 for n in NAMES}
    do_log = do_log or {n: 1 for n in NAMES}
    return {
        "names": list(NAMES),
        "active": active,
        "do_log": do_log,
        "trial_move": {n: 0.1 for n in NAMES},
        "prior_dist": {"n0": (1e6, 1e10), "p0": (1e14, 1e16),
                       "tauN": (1, 2e3), "tauP": (1, 2e3),
                       "mu_n": (1, 100), "mu_p": (1, 100)},
        "init_guess": {n: 1 for n in NAMES},
        "unit_conversions": {},
    }


STATE = np.array([1e8, 3e15, 500.0, 600.0, 20.0, 20.0])


def test_proposal_bounded_and_inactive_frozen():
    pi = _param_info(active={"n0": 0, "p0": 1, "tauN": 1, "tauP": 1,
                             "mu_n": 0, "mu_p": 0})
    plan = build_move_plan(pi, {"hard_bounds": 0})
    widths = jnp.asarray(
        [pi["trial_move"][n] if pi["active"][n] else 0.0 for n in NAMES])
    key = jax.random.PRNGKey(0)
    for i in range(20):
        new = np.asarray(make_trial_move(
            jnp.asarray(STATE), widths, jax.random.fold_in(key, i), plan))
        # frozen params BIT-identical: they must never pass through the
        # 10^(log10(s)) roundtrip, whose TPU-f32 systematic bias
        # (~1e-5..3e-5/application) silently walks frozen parameters away
        # from their configured values and biases the active posterior
        np.testing.assert_array_equal(new[[0, 4, 5]], STATE[[0, 4, 5]])
        # active params move at most width in log space
        d = np.abs(np.log10(new[[1, 2, 3]]) - np.log10(STATE[[1, 2, 3]]))
        assert np.all(d <= 0.1 + 1e-12)
        assert np.any(d > 0)


def test_hard_bounds_keeps_proposals_in_prior():
    pi = _param_info()
    plan = build_move_plan(pi, {"hard_bounds": 1})
    # start near the p0 upper bound with a big move width: without retries
    # many draws would land outside
    state = STATE.copy()
    state[1] = 9e15
    widths = jnp.full(len(NAMES), 0.3)
    key = jax.random.PRNGKey(1)
    inside = 0
    for i in range(15):
        new = np.asarray(make_trial_move(
            jnp.asarray(state), widths, jax.random.fold_in(key, i), plan))
        if 1e14 < new[1] < 1e16:
            inside += 1
    assert inside == 15


def test_approve_move_checks():
    pi = _param_info()
    plan = build_move_plan(pi, {"hard_bounds": 1})
    good = np.log10(STATE)
    assert bool(approve_move(jnp.asarray(good), plan))

    # p0 <= n0 fails
    bad = good.copy()
    bad[1] = bad[0] - 1
    assert not bool(approve_move(jnp.asarray(bad), plan))
    assert "p0_greater" in approve_move_report(bad, pi)

    # tauN/tauP differing by > 2 orders of magnitude fails
    bad = good.copy()
    bad[2] = np.log10(2.0)
    bad[3] = np.log10(1900.0)
    assert not bool(approve_move(jnp.asarray(bad), plan))
    assert "tn_tp_close" in approve_move_report(bad, pi)

    # out-of-prior active param fails with named check
    bad = good.copy()
    bad[4] = np.log10(500.0)  # mu_n ub is 100
    assert not bool(approve_move(jnp.asarray(bad), plan))
    assert "mu_n_size" in approve_move_report(bad, pi)


def test_inactive_params_skip_bounds_check():
    pi = _param_info(active={n: 0 for n in NAMES})
    plan = build_move_plan(pi, {"hard_bounds": 1})
    # wildly out-of-bounds but inactive -> only p0>n0 and tau checks apply
    st = np.log10(np.array([1e2, 1e30, 500.0, 600.0, 1e5, 1e5]))
    assert bool(approve_move(jnp.asarray(st), plan))


def test_mu_constraint_pins_ambipolar_mobility():
    pi = _param_info()
    pi["do_mu_constraint"] = [20.0, 3.0]
    plan = build_move_plan(pi, {"hard_bounds": 0})
    widths = jnp.full(len(NAMES), 0.05)
    key = jax.random.PRNGKey(3)
    for i in range(10):
        new = np.asarray(make_trial_move(
            jnp.asarray(STATE), widths, jax.random.fold_in(key, i), plan))
        mu_ambi = 2.0 / (1.0 / new[4] + 1.0 / new[5])
        assert 17.0 - 1e-9 <= mu_ambi <= 23.0 + 1e-9


def test_frozen_params_invariant_under_iterated_proposals_f32():
    """Iterating accepted proposals must leave zero-width params bit-exact
    even in float32, where log/pow roundtrips are NOT identities (the
    TPU-f32 roundtrip drift that biased the staub posterior, round 2)."""
    pi = _param_info(active={"n0": 0, "p0": 0, "tauN": 1, "tauP": 0,
                             "mu_n": 0, "mu_p": 0})
    plan = build_move_plan(pi, {"hard_bounds": 1})
    widths = jnp.asarray(
        [0.02 if pi["active"][n] else 0.0 for n in NAMES], jnp.float32)
    state = jnp.asarray(STATE, jnp.float32)
    start = np.asarray(state).copy()
    key = jax.random.PRNGKey(7)
    for i in range(50):
        state = make_trial_move(state, widths,
                                jax.random.fold_in(key, i), plan)
    frozen = [0, 1, 3, 4, 5]
    np.testing.assert_array_equal(np.asarray(state)[frozen], start[frozen])
