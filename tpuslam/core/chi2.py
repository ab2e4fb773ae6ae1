"""Chi-squared (2 dof) inverse CDF for confidence ellipses.

Capability parity with the reference's ``mylib/error_ellipse.py:24-37``,
which linearly interpolates a hardcoded 43-entry table of chi-squared
values against confidence percentages via ``scipy.interpolate.interp1d``.

Two implementations are provided:
  * :func:`chi2_ppf_2dof_table` - linear interpolation over the same
    43-point grid, for bit-level parity with the reference's rendering.
  * :func:`chi2_ppf_2dof` - the exact closed form.  For 2 degrees of
    freedom the chi-squared CDF is ``1 - exp(-x/2)``, so the p%-confidence
    quantile is ``x = -2 ln(1 - p/100)`` - no table, no SciPy, traceable.

Both are pure jnp and can run inside jit.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

#: Confidence percentages of the reference table (descending), and the
#: corresponding chi-squared (2 dof) quantiles.  Values regenerated from the
#: closed form x = -2 ln(1 - p/100) (they agree with the reference's
#: hardcoded table, mylib/error_ellipse.py:24-36, to its printed precision).
_P_GRID = (99.9, 99.5, 99.0, 98.5, 98.0, 97.5, 97.0, 96.0, 95.0, 94.0, 93.0,
           92.0, 91.0, 90.0, 85.0, 80.0, 75.0, 70.0, 65.0, 60.0, 55.0, 50.0,
           45.0, 40.0, 35.0, 30.0, 25.0, 20.0, 15.0, 10.0, 9.0, 8.0, 7.0,
           6.0, 5.0, 4.0, 3.0, 2.5, 2.0, 1.5, 1.0, 0.5, 0.0)


def _exact(p_percent):
    return -2.0 * jnp.log1p(-jnp.asarray(p_percent) / 100.0)


#: Table of quantiles matching _P_GRID, computed once at import in float64
#: so the grid agrees with the reference's hardcoded 9-digit table.
_CHI2_GRID = tuple(-2.0 * math.log1p(-p / 100.0) for p in _P_GRID)

#: Public aliases (consumed by the host-side renderer).
P_GRID = _P_GRID
CHI2_GRID = _CHI2_GRID


def chi2_ppf_2dof(p_percent):
    """Exact chi-squared (2 dof) quantile for p% central confidence.

    ``chi2_ppf_2dof(99.0)`` ~= 9.2103.  Closed form; preferred in new code.
    """
    return _exact(p_percent)


def chi2_ppf_2dof_table(p_percent):
    """Table-interpolated quantile, mirroring mylib/error_ellipse.py:24-37.

    Linear interpolation over the same 43-point grid the reference uses, so
    confidence-ellipse sizes match the reference pixel-for-pixel even at
    percentages between grid points.
    """
    # jnp.interp needs ascending x; the reference grid is descending.
    xs = jnp.asarray(_P_GRID[::-1])
    ys = jnp.asarray(_CHI2_GRID[::-1])
    return jnp.interp(jnp.asarray(p_percent), xs, ys)
