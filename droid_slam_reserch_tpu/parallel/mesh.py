"""Mesh helpers."""
import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("dp",), devices=None):
    """Create a Mesh over the available devices.

    shape: tuple matching axis_names (default: all devices on one axis).
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, axis_names)
