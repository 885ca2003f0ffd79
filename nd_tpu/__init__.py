"""nd_tpu — a TPU-native framework for n-dimensional Earth-observation
datacubes.

Built from scratch for TPUs (JAX / XLA / Pallas / pjit) with the same
capabilities as the reference CPU framework ``jnhansen/nd``: noise filters,
SAR change detection, reprojection/alignment, tiling, classification,
vector rasterization and visualization over labelled (y, x, time)
datacubes — but with device-resident data, fused XLA/Pallas kernels and
mesh-sharded (halo-exchange) parallelism instead of Cython + process
pools.
"""

from .core import DataArray, Dataset, concat, merge

__version__ = '0.1.0'

__all__ = ['DataArray', 'Dataset', 'concat', 'merge']
