"""Mesh construction helpers."""

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


def make_mesh(axes=None, devices=None):
    """Build a Mesh over the available devices.

    axes: dict axis_name -> size (sizes must multiply to n_devices), e.g.
    {"data": 2, "time": 4}. Default: all devices on one "data" axis.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if axes is None:
        axes = {"data": n}
    sizes = list(axes.values())
    assert int(np.prod(sizes)) == n, \
        f"mesh sizes {axes} must multiply to {n} devices"
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def data_head_specs(mesh, data_axis="data", head_axis=None):
    """PartitionSpecs for the standard video layout [B,HD,T,F,H,W]."""
    vid_spec = P(data_axis, head_axis)
    flow_spec = P(data_axis, head_axis)
    out_spec = P(data_axis, head_axis)
    return vid_spec, flow_spec, out_spec


def named(mesh, spec):
    return NamedSharding(mesh, spec)
