"""Device kernels (XLA/Pallas): convolution, non-local means, change
detection, statistics, interpolation."""

from .conv import convolve, separable_convolve, gaussian_kernel1d
from .nlmeans import nlmeans
from .stats import chi2_cdf
from .change import (change_detection, change_detection_exact,
                     change_detection_hybrid, omnibus_probabilities)
from .fft import (phase_cross_correlation,
                  phase_cross_correlation_batch, fourier_shift,
                  translate, translate_batch)
from .interp import map_coordinates

__all__ = ['convolve', 'separable_convolve', 'gaussian_kernel1d',
           'nlmeans', 'chi2_cdf', 'change_detection',
           'change_detection_exact', 'change_detection_hybrid',
           'omnibus_probabilities', 'phase_cross_correlation',
           'phase_cross_correlation_batch', 'fourier_shift',
           'translate', 'translate_batch', 'map_coordinates']
