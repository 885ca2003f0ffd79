"""N-dimensional noise-reduction filters over arbitrary dimension
subsets, executing on TPU.

Parity surface of /root/reference/nd/filters.py (Filter base,
ConvolutionFilter, BoxcarFilter, GaussianFilter, NLMeansFilter and the
functional wrappers), redesigned for device execution: the filter
payloads are XLA convolutions / Pallas-style fused scans
(``nd_tpu.ops``), data stays on device across the per-variable loop, and
chunked parallelism declares its halo via ``_buffer`` exactly like the
reference so split/apply/merge is bit-equal to the unsplit run.
"""

from __future__ import annotations

from abc import abstractmethod

import numpy as np

import jax.numpy as jnp

from .algorithm import Algorithm, wrap_algorithm, parallelize
from .core import DataArray, Dataset
from .io import disassemble_complex
from .ops.conv import convolve as _xla_convolve
from .ops.conv import gaussian_kernel1d, separable_convolve
from .ops.nlmeans import nlmeans as _xla_nlmeans
from .utils import get_vars_for_dims, expand_variables, is_complex

__all__ = ['Filter',
           'ConvolutionFilter', 'convolution',
           'BoxcarFilter', 'boxcar',
           'GaussianFilter', 'gaussian',
           'NLMeansFilter', 'nlmeans',
           '_expand_kernel']


# -----------------
# UTILITY FUNCTIONS
# -----------------

def _expand_kernel(kernel, kernel_dims, new_dims):
    """Reshape a kernel spanning ``kernel_dims`` to cover ``new_dims``.

    Raises ValueError if ``kernel_dims`` doesn't match the kernel rank or
    isn't a subset of ``new_dims`` (reference: filters.py:36-75).
    """
    if not set(new_dims).issuperset(set(kernel_dims)):
        raise ValueError('`new_dims` must be a superset of '
                         '`kernel_dims`.')
    if kernel.ndim != len(kernel_dims):
        raise ValueError('The length of `kernel_dims` must match the '
                         'dimension of `kernel`.')
    new_kernel_shape = np.ones(len(new_dims), dtype=int)
    new_kernel_shape[[new_dims.index(_) for _ in kernel_dims]] = \
        kernel.shape
    return kernel.reshape(new_kernel_shape)


# ----------------------
# ABSTRACT CLASS: FILTER
# ----------------------

class Filter(Algorithm):
    """Base class for a generic filter.

    Class attributes
    ----------------
    per_variable : bool
        If True the filter runs independently per variable; otherwise all
        variables jointly determine the filter weights.
    supports_complex : bool
        If False, complex variables are disassembled into re/im pairs
        before filtering (the result stays disassembled, matching the
        reference's behavior, filters.py:132-134).
    dims : tuple of str
        The dimensions the filter operates over.
    """

    per_variable = True
    supports_complex = False
    dims = ()

    @abstractmethod
    def __init__(self, *args, **kwargs):
        return

    @parallelize
    def apply(self, ds, inplace=False):
        """
        Apply the filter to the input dataset.

        Parameters
        ----------
        ds : Dataset or DataArray
            The input dataset
        inplace : bool, optional
            If True, overwrite the input data inplace (default: False).

        Returns
        -------
        Dataset or DataArray
            The filtered dataset
        """
        if inplace:
            raise NotImplementedError('Inplace filtering is not '
                                      'implemented for device arrays.')

        orig_dims = tuple(ds.sizes)
        ordered_dims = self.dims + tuple(d for d in orig_dims
                                         if d not in self.dims)

        convert_complex = is_complex(ds) and not self.supports_complex
        if convert_complex:
            ds = disassemble_complex(ds)

        if isinstance(ds, DataArray):
            if self.per_variable:
                vdims = ds.dims
                axes = tuple(vdims.index(d) for d in self.dims)
                result = ds.copy(deep=False)
                result.data = self._filter(ds.data, axes)
            else:
                # joint-weight filters (NLMeans) expect the canonical
                # layout (filter dims..., extra dims..., variable); a
                # bare DataArray is a single variable
                da_ordered = ds.transpose(*ordered_dims)
                axes = tuple(range(len(self.dims)))
                data = da_ordered.data[..., None]
                filtered = self._filter(data, axes)[..., 0]
                result = da_ordered._replace(filtered).transpose(*ds.dims)
        else:
            variables = get_vars_for_dims(ds, self.dims)
            other_variables = get_vars_for_dims(ds, self.dims,
                                                invert=True)
            if self.per_variable:
                result = ds.copy(deep=False)
                # Same-layout variables are stacked along a new leading
                # batch axis and filtered in ONE device dispatch: the
                # ``_filter`` contract broadcasts over every
                # non-filtered axis, so this is a pure fusion — it cuts
                # per-variable dispatch latency (dominant on remote/
                # tunneled backends) and feeds XLA larger batches.
                groups = {}
                for v in variables:
                    key = (ds[v].dims,
                           np.dtype(getattr(ds[v].data, 'dtype')))
                    groups.setdefault(key, []).append(v)
                for (vdims, _), vs in groups.items():
                    if len(vs) == 1:
                        v = vs[0]
                        axes = tuple(vdims.index(d) for d in self.dims)
                        filtered = self._filter(ds[v].data, axes)
                        result._variables[v] = \
                            result._variables[v].__class__(
                                vdims, filtered, ds[v].attrs)
                        continue
                    axes = tuple(vdims.index(d) + 1 for d in self.dims)
                    arrs = [ds[v].data for v in vs]
                    if all(isinstance(a, np.ndarray) for a in arrs):
                        # tiles stream in as host numpy — keep the
                        # stack on host so the conv layer can do its
                        # shape normalization before the upload
                        stacked = np.stack(arrs)
                    else:
                        stacked = jnp.stack(
                            [jnp.asarray(a) for a in arrs])
                    filtered = self._filter(stacked, axes)
                    for i, v in enumerate(vs):
                        result._variables[v] = \
                            result._variables[v].__class__(
                                vdims, filtered[i], ds[v].attrs)
            else:
                # variables form an extra axis; weights are joint.
                joint_dims = ordered_dims + ('variable',)
                da_ordered = ds[variables].to_array().transpose(
                    *joint_dims)
                axes = tuple(da_ordered.dims.index(d) for d in self.dims)
                filtered = self._filter(da_ordered.data, axes)
                da_filtered = da_ordered._replace(filtered)
                result = expand_variables(da_filtered)
                for v in result.data_vars:
                    # to_array broadcast every variable to the union of
                    # dims; restore the original order and append any
                    # broadcast extras (the reference crashes here for
                    # mixed-dim variables — we degrade gracefully)
                    have = result._variables[v].dims
                    order = (tuple(d for d in ds[v].dims if d in have)
                             + tuple(d for d in have
                                     if d not in ds[v].dims))
                    result._variables[v] = \
                        result._variables[v].transpose(*order)
                for v in other_variables:
                    result._variables[v] = ds._variables[v]
                result.attrs.update(ds.attrs)
                for ck, cv in ds._coords.items():
                    result._coords.setdefault(ck, cv)

        return result

    @abstractmethod
    def _filter(self, arr, axes, output=None):
        """Filter a raw array along ``axes``; returns the result.

        ``output`` is accepted for API parity; if it is a numpy array the
        result is also written into it.
        """
        return

    def _parallel_dimension(self, ds):
        """Split along the largest dimension not being filtered."""
        extra_dims = list(set(ds.sizes) - set(self.dims))
        if len(extra_dims) > 0:
            return sorted(extra_dims, key=lambda d: ds.sizes[d],
                          reverse=True)[0]
        return sorted(ds.sizes, key=lambda d: ds.sizes[d],
                      reverse=True)[0]

    def _finalize(self, result, output=None):
        if output is not None and isinstance(output, np.ndarray):
            output[...] = np.asarray(result)
        return result


# ------------------
# CONVOLUTION FILTER
# ------------------

class ConvolutionFilter(Filter):
    """Kernel convolution of a Dataset, on device.

    Parameters
    ----------
    dims : tuple, optional
        The dataset dimensions corresponding to the kernel axes
        (default: ('y', 'x')). Length must match the kernel rank.
    kernel : ndarray
        The convolution kernel.
    kwargs : dict, optional
        Extra keyword arguments (``mode``, ``cval``) with
        scipy.ndimage.convolve semantics.
    """

    per_variable = True
    supports_complex = True
    kwargs = {}

    def __init__(self, dims=('y', 'x'), kernel=None, **kwargs):
        if kernel is None:
            kernel = np.ones([1] * len(dims))
        self.dims = tuple(dims)
        self.kernel = np.asarray(kernel)
        self.kwargs = kwargs

    def _buffer(self, dim):
        """Halo: half the kernel extent along the split dimension."""
        if dim not in self.dims:
            return 0
        axis = self.dims.index(dim)
        return self.kernel.shape[axis] // 2

    def _filter(self, arr, axes, output=None):
        mode = self.kwargs.get('mode', 'reflect')
        cval = self.kwargs.get('cval', 0.0)
        # the kernel stays host-side: converting it to a device array
        # here would cost a tunnel round trip per tile on the host
        # placement path (convolve uploads it only when dispatching
        # to the device)
        result = _xla_convolve(arr, self.kernel, axes=axes,
                               mode=mode, cval=cval)
        return self._finalize(result, output)


convolution = wrap_algorithm(ConvolutionFilter, 'convolution')


# -------------
# BOXCAR FILTER
# -------------

class BoxcarFilter(ConvolutionFilter):
    """Uniform moving-average filter: every tap weighs ``1/w**N``.

    Parameters
    ----------
    dims : tuple of str, optional
        Dimensions the window slides over (default: ('y', 'x')).
    w : int
        Window width per dimension; use an odd value so the window is
        centred on the output pixel.
    kwargs : dict, optional
        Edge-handling options (``mode``, ``cval``).
    """

    def __init__(self, dims=('y', 'x'), w=3, **kwargs):
        N = len(dims)
        self.dims = tuple(dims)
        self.w = w
        self.kernel = np.ones((w,) * N, dtype=np.float64) / w ** N
        self.kwargs = kwargs


boxcar = wrap_algorithm(BoxcarFilter, 'boxcar')


# ---------------
# GAUSSIAN FILTER
# ---------------

class GaussianFilter(Filter):
    """A Gaussian filter (separable device convolutions).

    Parameters
    ----------
    dims : tuple of str, optional
        The dimensions along which to apply the Gaussian filtering
        (default: ('y', 'x')).
    sigma : float or sequence of float
        Standard deviation for the Gaussian kernel, per dimension if a
        sequence.
    kwargs : dict, optional
        ``truncate`` (default 4.0), ``mode``, ``cval`` with scipy
        semantics.

    Returns
    -------
    Dataset
        The filtered dataset.
    """

    def __init__(self, dims=('y', 'x'), sigma=1, **kwargs):
        if isinstance(sigma, (int, float)):
            sigma = [sigma] * len(dims)
        self.dims = tuple(dims)
        self.sigma = list(sigma)
        self.kwargs = kwargs

    def _buffer(self, dim):
        """Halo: the truncated kernel radius (4 sigma by default)."""
        if dim not in self.dims:
            return 0
        axis = self.dims.index(dim)
        sigma = self.sigma[axis]
        truncate = self.kwargs.get('truncate', 4.0)
        return int(truncate * sigma + 0.5)

    def _filter(self, arr, axes, output=None):
        truncate = self.kwargs.get('truncate', 4.0)
        mode = self.kwargs.get('mode', 'reflect')
        cval = self.kwargs.get('cval', 0.0)
        kernels = [gaussian_kernel1d(s, truncate) for s in self.sigma]
        if np.iscomplexobj(arr):        # dtype check, no upload
            arr = jnp.asarray(arr)
            re = separable_convolve(arr.real, kernels, axes, mode, cval)
            im = separable_convolve(arr.imag, kernels, axes, mode, cval)
            result = re + 1j * im
        else:
            result = separable_convolve(arr, kernels, axes, mode, cval)
        return self._finalize(result, output)


gaussian = wrap_algorithm(GaussianFilter, 'gaussian')


# ----------------------
# NON-LOCAL MEANS FILTER
# ----------------------

class NLMeansFilter(Filter):
    """Non-Local Means denoising (Buades et al. 2011), fused on TPU.

    Buades, A., Coll, B., & Morel, J.-M. (2011). Non-Local Means
    Denoising. Image Processing On Line, 1, 208-212.

    Parameters
    ----------
    dims : tuple of str
        The dataset dimensions along which to filter (up to 3).
    r : int or sequence
        Neighborhood search radius (per dim if a sequence).
    sigma : float
        Noise standard deviation.
    h : float
        Filtering strength.
    f : int
        Patch radius.
    n_eff : float, optional
        Desired effective sample size, or -1 to disable (default: -1).
    """

    per_variable = False

    def __init__(self, dims=('y', 'x'), r=1, sigma=1, h=1, f=1, n_eff=-1):
        if isinstance(r, (int, float)):
            r = [r] * len(dims)
        self.dims = tuple(dims)
        self.r = np.array(r, dtype=np.uint32)
        self.f = np.array([f if _ > 0 else 0 for _ in self.r],
                          dtype=np.uint32)
        self.sigma = sigma
        self.h = h
        self.n_eff = n_eff

    def _buffer(self, dim):
        """Halo: r + f along split dimensions (filters.py:437-445)."""
        if dim not in self.dims:
            return 0
        axis = self.dims.index(dim)
        return int(self.r[axis] + self.f[axis])

    def _filter(self, arr, axes, output=None):
        arr = jnp.asarray(arr)
        # Pad r and f to three dims (leading), mirroring the 4-D
        # (d0, d1, d2, var) kernel layout.
        ndim = arr.ndim
        pad_before = np.zeros(4 - ndim, dtype=self.r.dtype)
        pad_after = np.zeros(ndim - len(self.r) - 1, dtype=self.r.dtype)
        r = np.concatenate([pad_before, self.r, pad_after])
        f = np.concatenate([pad_before, self.f, pad_after])
        values = arr.reshape((1,) * (4 - ndim) + arr.shape)
        result = self._nlmeans_4d(values, r, f)
        result = result.reshape(arr.shape)
        return self._finalize(result, output)

    def _nlmeans_4d(self, values, r, f):
        """Dispatch the 4-D kernel: fused Pallas tile kernel on TPU
        (any radius pattern — spatial, temporal, or full 3-D), XLA
        scan otherwise."""
        from .ops.nlmeans_pallas import (nlmeans_pallas,
                                         nlmeans_spatial_pallas,
                                         supports_pallas)
        from .ops.pallas_guard import run_with_fallback

        def xla_path(v):
            return _xla_nlmeans(v, r, f, self.sigma, self.h,
                                self.n_eff)

        from .ops.nlmeans_pallas import fits_vmem
        active = [i for i in range(3) if r[i] > 0]
        if supports_pallas() and values.dtype == jnp.float32 \
                and active:
            rotated_2d = set(active) <= {1, 2} and r[0] == 0 \
                and f[0] == 0
            # VMEM admission uses the KERNEL's layout: the rotated
            # branch tiles (d1, d2) spatially with (d0, v) batched
            if rotated_2d:
                s = values.shape
                ok = fits_vmem((s[1], s[2], s[0], s[3]),
                               (r[1], r[2], 0), (f[1], f[2], 0))
            else:
                ok = fits_vmem(values.shape, r, f)
            if not ok:
                return xla_path(values)
            if rotated_2d:
                # rotate the batched axis to the back so the filtered
                # axes ride sublanes/lanes (d0 is often a broadcast
                # singleton from the 4-D padding)
                def pallas_path(v):
                    rotated = jnp.transpose(v, (1, 2, 0, 3))
                    out = nlmeans_spatial_pallas(
                        rotated, (int(r[1]), int(r[2])),
                        (int(f[1]), int(f[2])), self.sigma, self.h,
                        self.n_eff)
                    return jnp.transpose(out, (2, 0, 1, 3))
            else:
                # native (d0, d1, d2) window — covers spatial,
                # temporal-radius and full 3-D filtering
                def pallas_path(v):
                    return nlmeans_pallas(
                        v, (int(r[0]), int(r[1]), int(r[2])),
                        (int(f[0]), int(f[1]), int(f[2])),
                        self.sigma, self.h, self.n_eff)
            return run_with_fallback(pallas_path, xla_path,
                                     values, name='nlmeans')
        return xla_path(values)


nlmeans = wrap_algorithm(NLMeansFilter, 'nlmeans')
