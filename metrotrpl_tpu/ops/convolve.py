"""Instrument-response-function (IRF) convolution.

Reimplements the reference's moment-integral convolution scheme
(reference laplace.py:13-246) TPU-style:

* The moment tables I_m^n are computed in closed form on the host. The
  reference evaluates them with Simpson's rule over 1000 interpolants of a
  *linear* integrand (laplace.py:129-167); Simpson is exact for linear
  functions, so the closed form reproduces it to roundoff:

      I_m^0 = dt * (y_m + y_{m+1}) / 2
      I_m^1 = dt * (y_m - y_{m+1}) / 12
      I_m^2 = dt * (y_m + y_{m+1}) / 24

* The convolution itself (laplace.py:170-212) is three causal FIR filters
  over the half-step-resampled signal, expressed as XLA convolutions so a
  whole (chains x measurements) batch runs in one conv op.
"""

import jax
import jax.numpy as jnp
import numpy as np


def i_moment_closed(t_irf, f_irf):
    """Closed-form moment table, shape (nk_irf, 3); the last row stays zero
    like the reference's loop bound (laplace.py:37-39).

    dt is the mean grid step — the same definition the likelihood layer
    uses for the half-step resample grid (likelihood.py), so the FIR taps
    and the resampled signal always agree. (The reference uses
    t[1]-t[0] here but mean(diff) for the resample, laplace.py:66/162 —
    identical for the uniform grids its docstring requires, silently
    inconsistent otherwise; make_I_tables validates uniformity.)"""
    dt = float(np.mean(np.diff(t_irf)))
    nk = len(f_irf)
    table = np.zeros((nk, 3))
    a = f_irf[1:]   # y[m+1]
    b = f_irf[:-1]  # y[m]
    table[:-1, 0] = dt * (a + b) / 2
    table[:-1, 1] = dt * (b - a) / 12
    table[:-1, 2] = dt * (a + b) / 24
    return table


def make_I_tables(irfs):
    """Moment tables for each wavelength.

    irfs : dict wavelength -> (n, 2) array of (t, IRF(t)) samples.
    Returns dict wavelength -> (I_table (n, 3), t_irf (n,)).
    """
    tables = {}
    for w, irf in irfs.items():
        w = int(w)
        t_irf = irf[:, 0]
        f_irf = irf[:, 1]
        # The moment-convolution math requires a uniform time grid; a
        # non-uniform IRF file would silently corrupt every likelihood,
        # so fail loudly instead.
        d = np.diff(t_irf)
        if d.size and (d.max() - d.min()) > 1e-3 * abs(d.mean()):
            raise ValueError(
                f"IRF table for wavelength {w} is not uniformly sampled "
                f"(dt ranges {d.min():g}..{d.max():g}); the moment "
                "convolution requires a uniform time grid")
        tables[w] = (i_moment_closed(t_irf, f_irf), t_irf)
    return tables


def load_irf_tables(wavelengths, irf_dir="IRFs"):
    """Load ``irf_{w}nm.csv`` for each positive wavelength in a config's
    ``irf_convolution`` list and build the moment tables (the shared
    entry-point helper for mcmc/dense/mle)."""
    import os

    irfs = {}
    for w in wavelengths:
        if w > 0 and int(w) not in irfs:
            irfs[int(w)] = np.loadtxt(
                os.path.join(irf_dir, f"irf_{int(w)}nm.csv"), delimiter=",")
    return make_I_tables(irfs)


def fir_causal_batch(signals, taps):
    """Per-row causal FIR: out[b, k] = sum_j taps[b, j] * signals[b, k - j].

    signals (B, n), taps (B, m) -> (B, n). Runs as one grouped XLA conv
    (feature_group_count = B) so each batch row gets its own filter.
    """
    B, n = signals.shape
    m = taps.shape[1]
    lhs = signals[None]            # (1, B, n): batch=1, features=B
    rhs = jnp.flip(taps, axis=1)[:, None, :]  # (B, 1, m): one filter per group
    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1,),
        padding=[(m - 1, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=B,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def convolve_moments(resampled_y, I_table):
    """Moment-method convolution of a half-step-resampled signal batch.

    resampled_y (B, 2*nk + 1) : f(t) at half the IRF time step.
    I_table (B, nk_irf, 3)    : per-row moment tables.
    Returns (B, nk + 1) convolved values; index 0 is 0 by construction.
    """
    y = resampled_y
    i0 = y[:, 1::2]                                  # (B, nk)
    i1 = y[:, 2::2] - y[:, :-1:2]
    i2 = 2 * (y[:, 2::2] - 2 * y[:, 1::2] + y[:, :-1:2])

    h = (fir_causal_batch(i0, I_table[:, :, 0])
         + fir_causal_batch(i1, I_table[:, :, 1])
         + fir_causal_batch(i2, I_table[:, :, 2]))
    # h[k] = sum_j T[j] s[k-1-j]  ->  shift by one and prepend the k=0 zero
    zero = jnp.zeros((y.shape[0], 1), dtype=y.dtype)
    return jnp.concatenate([zero, h], axis=1)
