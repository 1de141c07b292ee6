"""Mesh construction and query-batch data parallelism."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D device mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh2d(shape: tuple[int, int] | None = None, axes=("dy", "dx")) -> Mesh:
    """2-D device mesh for block-sharded grids (rows x cols).

    Default shape: the most-square factorization of the device count, tall
    side on rows (bathymetry tiles are usually taller than wide)."""
    devs = jax.devices()
    if shape is None:
        n = len(devs)
        ny = int(np.sqrt(n))
        while n % ny:
            ny -= 1
        shape = (max(ny, n // ny), min(ny, n // ny))
    ny, nx = shape
    return Mesh(np.array(devs[: ny * nx]).reshape(ny, nx), tuple(axes))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_queries(mesh: Mesh, *arrays, axis: str = "dp"):
    """Place query arrays with their leading axis split across the mesh.

    Arrays are padded to a multiple of the mesh size (padding with the first
    element so padded lanes do harmless work); returns (padded_arrays, n_valid).
    """
    n = len(mesh.devices.flat)
    sh = NamedSharding(mesh, P(axis))
    out = []
    n_valid = None
    for a in arrays:
        a = np.asarray(a)
        n_valid = a.shape[0]
        pad = (-a.shape[0]) % n
        if pad:
            a = np.concatenate([a, np.broadcast_to(a[:1], (pad,) + a.shape[1:])])
        out.append(jax.device_put(a, sh))
    return out, n_valid
