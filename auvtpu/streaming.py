"""Streaming real-time AUV swath interpolation (BASELINE.json config 5).

The reference is a batch study, but its title workload is *real-time* AUV
mapping: sonar observations arrive as swaths while the vehicle moves, and the
map around the vehicle must stay interpolated.  TPU-native design:

- the mosaic lives in HBM as (elev, valid) planes that are updated **in
  place** via buffer donation (no reallocation per swath, mirroring how GridD
  uploads once and reuses, GridD.cu:65-83 — but without its per-batch
  alloc/free churn);
- ``ingest`` scatters a swath of (row, col, depth) observations with a fixed
  batch shape (ragged swaths are padded; pad lanes write to a scrap cell);
- ``window_fill`` crops a fixed-size window around the vehicle with a dynamic
  slice and runs the dense fill ops on it — constant shapes, so the whole
  loop is two compiled programs regardless of vehicle position.

For mosaics larger than one chip, combine with parallel.spatial row-band
sharding (the window crop then runs per band holding the vehicle).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .grid import RegularGrid
from .ops import fill_idw, fill_window_mean, kriging_at_cells, fill_kriging


@partial(jax.jit, donate_argnums=(0, 1))
def _ingest(elev, valid, rows, cols, vals, live):
    """Scatter a (padded) swath into the mosaic planes, in place.

    Dead (pad) lanes are routed to a true scrap index one past the end of the
    flat plane and dropped by the scatter (mode='drop'), so they can never
    clobber a live observation at any real cell — .at[].set with duplicate
    indices has undefined order, and a pad lane aimed at cell 0 could
    silently overwrite a genuine observation landing there in the same chunk.
    """
    W = elev.shape[1]
    n = elev.size
    flat = rows * W + cols
    f = jnp.where(live, flat, n)  # scrap index, dropped below
    ev = elev.reshape(-1).at[f].set(vals, mode="drop").reshape(elev.shape)
    ok = valid.reshape(-1).at[f].max(live.astype(valid.dtype), mode="drop")
    return ev, ok.reshape(valid.shape)


@partial(jax.jit, static_argnames=("win", "method", "k", "max_radius"))
def _window_fill(elev, valid, meta, r0, c0, *, win, method, k, max_radius):
    we = jax.lax.dynamic_slice(elev, (r0, c0), win)
    wv = jax.lax.dynamic_slice(valid, (r0, c0), win)
    min_lon, max_lon, min_lat, max_lat = meta
    g = RegularGrid(
        elev=we, valid=wv,
        min_lon=min_lon, max_lon=max_lon, min_lat=min_lat, max_lat=max_lat,
    )
    if method == "idw":
        plane = fill_idw(g, k=k, max_radius=max_radius)
    elif method == "mean":
        plane = fill_window_mean(g, k=k, max_radius=max_radius)
    elif method == "kriging":
        plane = fill_kriging(g, max_radius=max_radius)
    else:
        raise ValueError(method)
    return jnp.where(wv > 0.5, we, plane)


class StreamingInterpolator:
    """Incremental mosaic with constant-shape ingest and window queries.

    >>> si = StreamingInterpolator((4096, 4096), extent, swath_cap=4096)
    >>> si.ingest(rows, cols, depths)          # per ping/swath
    >>> tile = si.window_fill(r_auv, c_auv)    # interpolated local map
    """

    def __init__(
        self,
        shape: tuple[int, int],
        extent,
        *,
        swath_cap: int = 4096,
        window: tuple[int, int] = (256, 256),
        method: str = "idw",
        k: int = 8,
        max_radius: int = 10,
        dtype=jnp.float32,
    ):
        self.elev = jnp.zeros(shape, dtype)
        self.valid = jnp.zeros(shape, dtype)
        self.extent = extent
        self.swath_cap = int(swath_cap)
        self.window = tuple(window)
        self.method = method
        self.k = k
        self.max_radius = max_radius
        self._meta = (
            float(extent.min_lon), float(extent.max_lon),
            float(extent.min_lat), float(extent.max_lat),
        )

    @property
    def shape(self):
        return self.elev.shape

    def ingest(self, rows, cols, vals) -> int:
        """Add observations; returns how many were ingested.  Swaths longer
        than swath_cap are split into fixed-size chunks (one compiled shape).
        """
        rows = np.asarray(rows, np.int32)
        cols = np.asarray(cols, np.int32)
        vals = np.asarray(vals, np.float32)
        n = rows.shape[0]
        cap = self.swath_cap
        for s in range(0, max(n, 1), cap):
            e = min(s + cap, n)
            m = e - s
            pad = cap - m
            r = np.pad(rows[s:e], (0, pad))
            c = np.pad(cols[s:e], (0, pad))
            v = np.pad(vals[s:e], (0, pad))
            live = np.arange(cap) < m
            self.elev, self.valid = _ingest(
                self.elev, self.valid,
                jnp.asarray(r), jnp.asarray(c), jnp.asarray(v), jnp.asarray(live),
            )
        return n

    def window_fill(self, center_row: int, center_col: int):
        """Interpolated (win_h, win_w) map around the vehicle; observed cells
        keep their measured values, gaps are filled by the chosen method."""
        wh, ww = self.window
        H, W = self.shape
        r0 = int(np.clip(center_row - wh // 2, 0, H - wh))
        c0 = int(np.clip(center_col - ww // 2, 0, W - ww))
        return _window_fill(
            self.elev, self.valid, self._meta,
            jnp.asarray(r0, jnp.int32), jnp.asarray(c0, jnp.int32),
            win=self.window, method=self.method, k=self.k,
            max_radius=self.max_radius,
        ), (r0, c0)

    def snapshot(self) -> np.ndarray:
        """Host copy of the mosaic with NaN gaps (reference representation)."""
        elev = np.asarray(self.elev, np.float64)
        valid = np.asarray(self.valid) > 0.5
        return np.where(valid, elev, np.nan)
