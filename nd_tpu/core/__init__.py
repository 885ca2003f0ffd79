"""Core data model for the TPU-native datacube framework."""

from .variable import Variable, is_device_array, get_xp, as_array
from .dataarray import (DataArray, Dataset, concat, merge, broadcast,
                        full_like, zeros_like, ones_like)

__all__ = ['Variable', 'DataArray', 'Dataset', 'concat', 'merge',
           'broadcast', 'full_like', 'zeros_like', 'ones_like',
           'is_device_array', 'get_xp', 'as_array']
