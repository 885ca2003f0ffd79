"""Device kernels (XLA/Pallas): convolution, non-local means, change
detection, statistics, interpolation."""

from .conv import convolve, separable_convolve, gaussian_kernel1d
from .nlmeans import nlmeans
from .stats import chi2_cdf
from .change import change_detection, omnibus_probabilities

__all__ = ['convolve', 'separable_convolve', 'gaussian_kernel1d',
           'nlmeans', 'chi2_cdf', 'change_detection',
           'omnibus_probabilities']
