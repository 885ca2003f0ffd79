"""Time-series change detection on SAR covariance datacubes.

Parity surface of /root/reference/nd/change.py (ChangeDetection ABC,
OmnibusTest, ``omnibus`` functional wrapper). The Wishart omnibus kernel
runs fused on the TPU (``nd_tpu.ops.change``) with a built-in chi-square
CDF — no GSL, no OpenMP; see the kernel module for the redesign notes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .algorithm import Algorithm, wrap_algorithm
from .core import DataArray
from .filters import BoxcarFilter
from .io import disassemble_complex
from .ops.change import change_detection as _change_detection
from .utils import requires

__all__ = ['ChangeDetection', 'OmnibusTest', 'omnibus']


class ChangeDetection(Algorithm):
    """Abstract base class for change detection algorithms."""

    njobs = 1

    def __init__(self, njobs=1):
        self.njobs = njobs


def _omnibus_change_detection(ds, alpha=0.01, ml=None, n=1, njobs=1):
    """Change detection after Conradsen et al. (2016).

    Parameters
    ----------
    ds : Dataset
        A (multilooked) dataset in covariance matrix format with
        variables C11, C12 (complex or re/im pair), C22.
    alpha : float (0. ... 1.), optional
        The probability threshold (default: 0.01). A change is flagged
        when the chi-square probability of the omnibus statistic exceeds
        ``alpha`` — identical convention to the reference
        (/root/reference/nd/_change.pyx:239-253).
    ml : int, optional
        Multilooking window size applied before testing. If None the
        dataset is assumed to be multilooked already (default: None).
    n : int, optional
        The number of looks in ``ds``; ignored when ``ml`` is given
        (default: 1).
    njobs : int, optional
        Kept for API parity; the device kernel parallelizes over all
        pixels regardless.

    Returns
    -------
    DataArray
        Boolean change map over (y, x, time).
    """
    ds_m = disassemble_complex(ds)

    if ml is not None:
        ds_m = BoxcarFilter(w=ml).apply(ds_m)
        n = ml ** 2

    da = ds_m[['C11', 'C12__re', 'C12__im', 'C22']].to_array()
    da = da.transpose('y', 'x', 'time', 'variable')
    # device in -> device out: a chained pipeline's cube is already in
    # HBM, and forcing the boolean map through the host link costs
    # more than the whole scan (the dev tunnel moves ~26 MB/s; the
    # exact kernel runs at ~2 Gpix/s). Host-resident inputs keep the
    # reference-style numpy delivery via the bit-packed hybrid
    # transfer.
    host_in = not isinstance(da.data, jax.Array)
    values = jnp.asarray(da.data)

    from .ops.change import change_detection_hybrid
    from .ops.change_pallas import supports_pallas_rescan
    sharding = getattr(values, 'sharding', None)
    multi_device = sharding is not None and \
        len(getattr(sharding, 'device_set', ())) > 1
    # the hybrid rescans suspects exactly, so long series stay
    # Pallas-eligible via the round-capped kernel (k <= 128)
    if supports_pallas_rescan(values.shape[2], int(n),
                              float(alpha)) and not multi_device:
        # fused Pallas kernel + exact float64 patching of the rare
        # near-margin pixels — exact decisions at fast-mode speed
        change = change_detection_hybrid(values, alpha=float(alpha),
                                         n=int(n),
                                         return_device=not host_in)
    else:
        # mesh-sharded inputs stay on the jittable XLA path: GSPMD
        # partitions it over the pixel grid, while the host-driven
        # hybrid would gather the cube to one device
        change = _change_detection(values, alpha=float(alpha),
                                   n=int(n))

    coords = {k: v for k, v in ds._coords.items()}
    payload = np.asarray(change) if host_in else jnp.asarray(change)
    out = DataArray(payload, dims=('y', 'x', 'time'),
                    attrs=dict(ds.attrs), name='change')
    for ck, cv in coords.items():
        if set(cv.dims).issubset({'y', 'x', 'time'}):
            out._coords[ck] = cv
    return out


@requires('gsl')  # capability flag: satisfied natively (chi2 on device)
class OmnibusTest(ChangeDetection):
    """Complex-Wishart omnibus change detection (Conradsen et al. 2016)
    for dual-pol SAR covariance time series, computed as a fused TPU
    kernel over the whole cube.

    Parameters
    ----------
    ds : Dataset
        Covariance-format cube (``C11, C12__re, C12__im, C22``). Pass
        ``ml`` if it has not been multilooked yet.
    ml : int, optional
        Window size for on-the-fly multilooking; omit when ``ds`` is
        already multilooked.
    n : int, optional
        Number of looks the cube carries. Ignored (and derived as
        ``ml**2``) when ``ml`` is given (default: 1).
    alpha : float in (0, 1), optional
        Significance level of the per-test rejection (default: 0.01).
    kwargs : dict, optional
        Forwarded to ``ChangeDetection.__init__`` (e.g. ``njobs``).
    """

    def __init__(self, ml=None, n=1, alpha=0.01, *args, **kwargs):
        self.ml = ml
        self.n = n
        self.alpha = alpha
        super().__init__(*args, **kwargs)

    def apply(self, ds):
        return _omnibus_change_detection(ds, alpha=self.alpha,
                                         ml=self.ml, n=self.n,
                                         njobs=self.njobs)


omnibus = wrap_algorithm(OmnibusTest, 'omnibus')
