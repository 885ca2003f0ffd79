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

import os as _os

import jax as _jax

# Datacube processing is dtype-faithful: float64 cubes stay float64
# (parity with the reference's CPU numerics). Opt out with ND_TPU_X64=0
# for pure-f32 deployments.
if _os.environ.get('ND_TPU_X64', '1') != '0':
    _jax.config.update('jax_enable_x64', True)

from .core import DataArray, Dataset, concat, merge
from .algorithm import Algorithm, wrap_algorithm, parallelize
from .io import open_dataset, to_netcdf
from . import utils  # noqa: F401
from . import filters  # noqa: F401
from . import change  # noqa: F401
from . import warp  # noqa: F401
from . import tiling  # noqa: F401
from .tiling import auto_merge
from . import tracing  # noqa: F401
from . import accessors  # noqa: F401  (registers .nd / .filter)

try:
    from .visualize import to_rgb, write_video
except ImportError:  # pragma: no cover - cv2/imageio optional
    to_rgb = write_video = None

__version__ = '0.1.0'

__all__ = ['DataArray', 'Dataset', 'concat', 'merge', 'Algorithm',
           'wrap_algorithm', 'parallelize', 'open_dataset', 'to_netcdf',
           'auto_merge', 'to_rgb', 'write_video']
