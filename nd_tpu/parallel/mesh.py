"""Device-mesh construction helpers.

The TPU replacement for the reference's process pool (utils.py:389-392
there): parallelism is expressed as a named ``jax.sharding.Mesh`` whose
axes map onto datacube dimensions (usually the spatial y/x axes), so
XLA partitions the kernels and inserts ICI collectives.
"""

from __future__ import annotations

import numpy as np

import jax

__all__ = ['get_mesh', 'factorize2d']


def factorize2d(n):
    """Split n into the most square (a, b) factorization with a*b = n."""
    best = (1, n)
    for a in range(1, int(np.sqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


def get_mesh(shape=None, axis_names=('y', 'x'), devices=None):
    """Build a Mesh over the available devices.

    Parameters
    ----------
    shape : tuple of int, optional
        Devices per axis; by default the device count is factorized as
        squarely as possible over two axes.
    axis_names : tuple of str, optional
        Mesh axis names; name them after datacube dims (default
        ('y', 'x')) so sharding specs read naturally.
    devices : list, optional
        Devices to use (default: all).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            shape = factorize2d(n)
            shape = shape + (1,) * (len(axis_names) - 2)
    if int(np.prod(shape)) != n:
        raise ValueError('mesh shape %r does not match %d devices'
                         % (shape, n))
    dev_array = np.asarray(devices).reshape(shape)
    return jax.sharding.Mesh(dev_array, axis_names)
