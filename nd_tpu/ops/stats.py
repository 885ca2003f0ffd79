"""Statistical primitives on device.

Replaces the reference's GSL dependency (``gsl_cdf_chisq_P``,
/root/reference/nd/_change.pyx:147-148) with XLA-native special
functions, so change detection needs no C library and runs fused on the
TPU.
"""

from __future__ import annotations

import jax
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
    if not jnp.issubdtype(x.dtype, jnp.floating):
        # integer statistics: both operands must land on ONE float
        # dtype (lax.igamma rejects mixed precisions)
        x = x.astype(jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
    df = jnp.asarray(df, x.dtype)
    safe_x = jnp.maximum(x, 0.0)
    out = lax.igamma(df / 2.0, safe_x / 2.0)
    out = jnp.where(x < 0, jnp.zeros_like(out), out)
    return jnp.where(jnp.isnan(x), jnp.full_like(out, jnp.nan), out)
