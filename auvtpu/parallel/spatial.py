"""Spatially-sharded dense fills: row-band grid sharding with halo exchange.

The dense fill ops (auvtpu.ops.dense) only look max_radius rows/cols away, so
a grid sharded into row bands needs just a max_radius-row halo from each
neighbor.  Halos move over ICI via ``jax.lax.ppermute`` inside ``shard_map``
(devices with no neighbor receive zeros — exactly the zero-validity padding
the global edges want), each band runs the unchanged single-device fill on its
halo-extended block, and the halo rows are sliced off.  This is the stencil
analog of sequence parallelism and the scale-up path for grids larger than
one chip's HBM (SURVEY.md §5 'Long-context').
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..grid import RegularGrid
from ..ops import dense as dense_ops


def _neighbor_perms(n: int):
    fwd = [(i, i + 1) for i in range(n - 1)]  # send downward (to next band)
    bwd = [(i + 1, i) for i in range(n - 1)]  # send upward (to previous band)
    return fwd, bwd


@partial(
    jax.jit,
    static_argnames=("mesh", "method", "k", "power", "max_radius", "n_rows", "meta"),
)
def _sharded_fill_impl(elev, valid, mesh, method, k, power, max_radius, n_rows, meta):
    n = len(mesh.devices.flat)
    R = max_radius
    fwd, bwd = _neighbor_perms(n)
    min_lon, max_lon, min_lat, max_lat, lat_step, lon_step = meta
    blk = elev.shape[0] // n

    def local(e, v):
        # e, v: (blk, W) local band
        idx = jax.lax.axis_index("dp")
        # halo exchange: my top R rows go to the previous band's bottom halo,
        # my bottom R rows go to the next band's top halo.
        top_halo_e = jax.lax.ppermute(e[-R:], "dp", fwd)  # from prev band
        top_halo_v = jax.lax.ppermute(v[-R:], "dp", fwd)
        bot_halo_e = jax.lax.ppermute(e[:R], "dp", bwd)  # from next band
        bot_halo_v = jax.lax.ppermute(v[:R], "dp", bwd)
        big_e = jnp.concatenate([top_halo_e, e, bot_halo_e], axis=0)
        big_v = jnp.concatenate([top_halo_v, v, bot_halo_v], axis=0)
        g = RegularGrid(
            elev=big_e,
            valid=big_v,
            min_lon=min_lon,
            max_lon=max_lon,
            min_lat=min_lat,
            max_lat=max_lat,
        )
        if method == "idw":
            out = dense_ops.fill_idw(g, k=k, power=power, max_radius=R)
        elif method == "window_mean":
            out = dense_ops.fill_window_mean(g, k=k, max_radius=R)
        elif method == "bilinear":
            out = dense_ops.fill_bilinear(g)
        elif method == "kriging":
            row0 = idx * blk - R
            out = dense_ops.fill_kriging(
                g, max_radius=R, row0=row0, steps=(lat_step, lon_step)
            )
        else:
            raise ValueError(method)
        return out[R : R + blk]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp", None)),
        out_specs=P("dp", None),
    )
    return fn(elev, valid)[:n_rows]


@partial(
    jax.jit,
    static_argnames=("mesh", "max_radius", "max_lag", "n_bins", "n_rows", "meta"),
)
def _sharded_fit_fill_impl(elev, valid, mesh, max_radius, max_lag, n_bins, n_rows, meta):
    from ..variogram import fit_exponential, pair_sums, _bin_table

    n = len(mesh.devices.flat)
    R = max(max_radius, max_lag)
    fwd, bwd = _neighbor_perms(n)
    min_lon, max_lon, min_lat, max_lat, lat_step, lon_step = meta
    blk = elev.shape[0] // n
    _, _, _, centers = _bin_table(max_lag, n_bins)

    def local(e, v):
        idx = jax.lax.axis_index("dp")
        top_e = jax.lax.ppermute(e[-R:], "dp", fwd)
        top_v = jax.lax.ppermute(v[-R:], "dp", fwd)
        bot_e = jax.lax.ppermute(e[:R], "dp", bwd)
        bot_v = jax.lax.ppermute(v[:R], "dp", bwd)

        # --- fit: distributed variogram pair sums (pairs counted once via the
        # half-plane convention; bottom halo supplies cross-band partners)
        band_e = jnp.concatenate([e, bot_e[:max_lag]], axis=0)
        band_v = jnp.concatenate([v, bot_v[:max_lag]], axis=0)
        s, c = pair_sums(band_e, band_v, blk, max_lag=max_lag, n_bins=n_bins)
        s = jax.lax.psum(s, "dp")
        c = jax.lax.psum(c, "dp")
        gamma = jnp.where(c > 0, s / (2.0 * jnp.maximum(c, 1.0)), 0.0)
        step = jnp.asarray(0.5 * (abs(lat_step) + abs(lon_step)), e.dtype)
        lags = jnp.asarray(centers, e.dtype) * step
        vparams = fit_exponential(lags, gamma, c)

        # --- predict: kriging fill with the fitted variogram
        big_e = jnp.concatenate([top_e, e, bot_e], axis=0)
        big_v = jnp.concatenate([top_v, v, bot_v], axis=0)
        g = RegularGrid(
            elev=big_e, valid=big_v,
            min_lon=min_lon, max_lon=max_lon, min_lat=min_lat, max_lat=max_lat,
        )
        row0 = idx * blk - R
        out = dense_ops.fill_kriging(
            g, max_radius=max_radius, row0=row0, steps=(lat_step, lon_step),
            vparams=vparams,
        )
        return out[R : R + blk], vparams

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp", None)),
        out_specs=(P("dp", None), P()),
    )
    plane, vparams = fn(elev, valid)
    return plane[:n_rows], vparams


def sharded_fit_fill(
    mesh: Mesh,
    grid: RegularGrid,
    *,
    max_radius: int = 10,
    max_lag: int = 10,
    n_bins: int = 10,
):
    """Full distributed 'training step': fit the exponential variogram from
    the observed cells (pair sums psum'd over the mesh) and krige-fill the
    grid with the fitted parameters.  Returns (plane (H, W), (nugget, sill,
    range)).  This is the step __graft_entry__.dryrun_multichip exercises."""
    n = len(mesh.devices.flat)
    H, W = grid.shape
    R = max(max_radius, max_lag)
    pad = (-H) % n
    elev, valid = grid.elev, grid.valid
    if pad:
        elev = jnp.concatenate([elev, jnp.zeros((pad, W), elev.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad, W), valid.dtype)])
    if (H + pad) // n < R:
        raise ValueError(f"band height {(H + pad) // n} < halo {R}")
    sh = NamedSharding(mesh, P("dp", None))
    elev = jax.device_put(elev, sh)
    valid = jax.device_put(valid, sh)
    meta = (grid.min_lon, grid.max_lon, grid.min_lat, grid.max_lat,
            grid.lat_step, grid.lon_step)
    return _sharded_fit_fill_impl(elev, valid, mesh, max_radius, max_lag, n_bins, H, meta)


def sharded_fill(
    mesh: Mesh,
    grid: RegularGrid,
    method: str = "idw",
    *,
    k: int = 8,
    power: float = 2.0,
    max_radius: int = 10,
):
    """Dense fill of a row-band-sharded grid; returns the (H, W) plane.

    The grid is padded with invalid rows to a multiple of the mesh size; each
    band must still be >= max_radius rows tall (one-hop halo).
    """
    n = len(mesh.devices.flat)
    H, W = grid.shape
    pad = (-H) % n
    elev = grid.elev
    valid = grid.valid
    if pad:
        elev = jnp.concatenate([elev, jnp.zeros((pad, W), elev.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad, W), valid.dtype)])
    if (H + pad) // n < max_radius:
        raise ValueError(
            f"band height {(H + pad) // n} < max_radius {max_radius}: "
            "use fewer devices or a taller grid (multi-hop halo not implemented)"
        )
    sh = NamedSharding(mesh, P("dp", None))
    elev = jax.device_put(elev, sh)
    valid = jax.device_put(valid, sh)
    meta = (
        grid.min_lon,
        grid.max_lon,
        grid.min_lat,
        grid.max_lat,
        grid.lat_step,
        grid.lon_step,
    )
    return _sharded_fill_impl(
        elev, valid, mesh, method, k, power, max_radius, H, meta
    )
