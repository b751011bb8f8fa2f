"""Static-shape 1D linear interpolation utilities.

Replaces the reference's scipy ``griddata`` 1D linear interpolation
(reference laplace.py:74,:121) with fixed-shape jnp ops so they trace
under jit/vmap. Out-of-range queries return NaN like griddata, so failure
semantics (NaN -> -inf likelihood) carry over.
"""

import jax.numpy as jnp


def interp1d(xq, x, y, fill_value=jnp.nan):
    """Linear interpolation of y(x) at query points xq.

    x must be increasing. Queries outside [x[0], x[-1]] get ``fill_value``
    (NaN by default — matching scipy.griddata semantics so downstream
    failure handling sees them).
    """
    idx = jnp.clip(jnp.searchsorted(x, xq, side="right") - 1, 0, len(x) - 2)
    x0 = x[idx]
    x1 = x[idx + 1]
    y0 = y[..., idx]
    y1 = y[..., idx + 1]
    t = (xq - x0) / (x1 - x0)
    out = y0 + t * (y1 - y0)
    oob = (xq < x[0]) | (xq > x[-1])
    return jnp.where(oob, fill_value, out)


def searchsorted_interp(xq, x, y):
    """interp1d with edge clamping instead of NaN fill (jnp.interp)."""
    return jnp.interp(xq, x, y)
