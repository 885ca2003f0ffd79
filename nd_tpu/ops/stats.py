"""Statistical primitives on device.

Replaces the reference's GSL dependency (``gsl_cdf_chisq_P``,
/root/reference/nd/_change.pyx:147-148) with XLA-native special
functions, so change detection needs no C library and runs fused on the
TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ['chi2_cdf', 'gammainc_lower']


def gammainc_lower(a, x):
    """Regularized lower incomplete gamma P(a, x)."""
    return lax.igamma(a, x)


def chi2_cdf(x, df):
    """CDF of the chi-square distribution with ``df`` degrees of freedom.

    chi2.cdf(x, df) = P(df/2, x/2). NaN inputs propagate (like GSL when
    handed a NaN statistic).
    """
    x = jnp.asarray(x)
    df = jnp.asarray(df, x.dtype if jnp.issubdtype(
        jnp.asarray(x).dtype, jnp.floating) else jnp.float32)
    safe_x = jnp.maximum(x, 0.0)
    out = lax.igamma(df / 2.0, safe_x / 2.0)
    out = jnp.where(x < 0, jnp.zeros_like(out), out)
    return jnp.where(jnp.isnan(x), jnp.full_like(out, jnp.nan), out)
