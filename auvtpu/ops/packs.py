"""Stencil packs: gather-aligned neighborhood layouts for scattered queries.

A scattered query needs a whole neighborhood (4 bilinear corners, 16 bicubic
taps, 25 window candidates), and per-index gather cost on TPU dwarfs payload
cost.  A *pack* precomputes, for every cell, its neighborhood values into P
adjacent lanes (P a power of two dividing 128), NaN-encoding validity.  One
row-block fetch then returns the entire stencil: cell i's P lanes start at
lane (i*P) mod 128 of block (i*P) // 128 — never straddling a block because
P | 128.

Packs are built once per grid by dense shifts (a P-pass pipeline over HBM)
and amortize across every subsequent batch, exactly like the reference's
ctor-time grid upload (GridD.cu:65-83) — but shaped for the gather unit.

Cost: P x grid bytes of HBM (bilinear 4x, bicubic 16x, radius-2 window 32x).
For radius > 2 windows (heavily masked grids) packs are impractical (441
taps); the per-offset gather path in ops.window covers that regime.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import RegularGrid
from .dense import sorted_offsets

_LANES = 128

# invalid taps are a finite sentinel inside packs (NaN would poison the
# one-hot sub-block selection: 0 * NaN = NaN); converted to NaN on fetch
_SENTINEL = 1e30


def _sentinel_plane(grid: RegularGrid):
    return jnp.where(grid.valid > 0.5, grid.elev, _SENTINEL)


def build_pack(grid: RegularGrid, offsets, clamp: bool):
    """(H*W*P,) packed plane for the given (dy, dx) offsets (P padded to a
    power of two dividing 128).

    clamp=True replicates edges (bilinear/bicubic index clamping); False
    marks out-of-grid taps NaN (window candidates).
    """
    H, W = grid.shape
    P = 1
    while P < len(offsets):
        P *= 2
    assert P <= _LANES
    planes = []
    src = _sentinel_plane(grid)
    for dy, dx in offsets:
        jj = jnp.arange(H, dtype=jnp.int32) + dy
        ii = jnp.arange(W, dtype=jnp.int32) + dx
        if clamp:
            jj = jnp.clip(jj, 0, H - 1)
            ii = jnp.clip(ii, 0, W - 1)
            plane = src[jj][:, ii]
        else:
            inb = ((jj >= 0) & (jj < H))[:, None] & ((ii >= 0) & (ii < W))[None, :]
            plane = jnp.where(
                inb, src[jnp.clip(jj, 0, H - 1)][:, jnp.clip(ii, 0, W - 1)], _SENTINEL
            )
        planes.append(plane)
    for _ in range(P - len(offsets)):
        planes.append(jnp.full((H, W), _SENTINEL, src.dtype))
    return jnp.stack(planes, axis=-1).reshape(-1), P


def fetch_pack(pack: jax.Array, P: int, cell_idx: jax.Array) -> jax.Array:
    """cell_idx (N,) int32 -> (N, P) stencil values (NaN = invalid tap).

    One (N, 128) row-block fetch + a (128/P)-way sub-block select.
    """
    n_pad = (-pack.shape[0]) % _LANES
    flat = jnp.pad(pack, (0, n_pad)) if n_pad else pack
    pr = flat.reshape(-1, _LANES)
    start = cell_idx * P
    rows = start // _LANES
    sub = (start % _LANES) // P  # which of the 128/P sub-blocks
    rd = jnp.take(pr, rows, axis=0)  # (N, 128)
    g = _LANES // P
    rdg = rd.reshape(-1, g, P)
    oh = (
        sub[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    ).astype(pack.dtype)
    st = jnp.einsum("ng,ngp->np", oh, rdg)
    return jnp.where(st >= 0.5 * _SENTINEL, jnp.nan, st)


# ---------------------------------------------------------------------------
# packed scattered ops (fully-sharing the math of ops.scattered)
# ---------------------------------------------------------------------------

BILINEAR_OFFSETS = [(0, 0), (0, 1), (1, 0), (1, 1)]
BICUBIC_OFFSETS = [(m, n) for m in range(-1, 3) for n in range(-1, 3)]


def window_offsets(max_radius: int, convention: str = "reference"):
    """Window offsets in v2 (distance, collection) order."""
    dx, dy, _ = sorted_offsets(max_radius, convention)
    return [(int(y), int(x)) for y, x in zip(dy, dx)]


class StencilPack:
    """Prebuilt packs for a grid: bilinear + bicubic + radius-R window."""

    def __init__(self, grid: RegularGrid, *, window_radius: int = 2):
        self.grid = grid
        self.window_radius = window_radius
        self.bilinear, self.p_bilinear = build_pack(grid, BILINEAR_OFFSETS, clamp=True)
        self.bicubic, self.p_bicubic = build_pack(grid, BICUBIC_OFFSETS, clamp=True)
        offs = window_offsets(window_radius)
        self.window, self.p_window = build_pack(grid, offs, clamp=False)
        d = np.asarray(offs, np.float64)
        self.window_d2_base = None  # distances depend on the query position


def _normalize(grid: RegularGrid, lons, lats):
    from .scattered import _normalize as norm

    return norm(grid, lons, lats)


@jax.jit
def packed_bilinear(pack: jax.Array, grid: RegularGrid, lons, lats):
    x, y, oob = _normalize(grid, lons, lats)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = x - x0
    wy = y - y0
    # the pack clamps the +1 taps at build time, matching min(x0+1, W-1)
    st = fetch_pack(pack, 4, y0 * grid.num_lon + x0)
    z00, z01, z10, z11 = st[:, 0], st[:, 1], st[:, 2], st[:, 3]
    ok = ~jnp.isnan(st)
    cnt = ok.sum(axis=1)
    s = jnp.where(ok, st, 0.0).sum(axis=1)
    fb = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), jnp.nan)
    z0 = (1 - wx) * z00 + wx * z01
    z1 = (1 - wx) * z10 + wx * z11
    z = (1 - wy) * z0 + wy * z1
    out = jnp.where(cnt < 4, fb, z)
    return jnp.where(oob, jnp.nan, out)


@jax.jit
def packed_bicubic(pack: jax.Array, grid: RegularGrid, lons, lats):
    """Clean-stencil bicubic (fully-valid grids; NaN taps propagate NaN,
    reproducing 'no fallback' — use the window path for masked grids)."""
    from .scattered import _catmull_rom

    x, y, oob = _normalize(grid, lons, lats)
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    tx = x - xi
    ty = y - yi
    st = fetch_pack(pack, 16, yi * grid.num_lon + xi)  # rows m=-1..2, cols n=-1..2
    rows = [
        _catmull_rom(st[:, 4 * m + 0], st[:, 4 * m + 1], st[:, 4 * m + 2], st[:, 4 * m + 3], tx)
        for m in range(4)
    ]
    out = _catmull_rom(rows[0], rows[1], rows[2], rows[3], ty)
    return jnp.where(oob, jnp.nan, out)


@partial(jax.jit, static_argnames=("k", "window_radius", "convention"))
def packed_window_select(pack, grid: RegularGrid, lons, lats, *, k, window_radius, convention="reference"):
    """Window top-k from a pack: one fetch + masked top_k, v2 semantics."""
    x, y, oob = _normalize(grid, lons, lats)
    ci = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, grid.num_lon - 1)
    cj = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, grid.num_lat - 1)
    offs = window_offsets(window_radius)  # pack layout is fixed (reference order)
    P = 1
    while P < len(offs):
        P *= 2
    st = fetch_pack(pack, P, cj * grid.num_lon + ci)  # (N, P)
    half = 0.5 if convention == "reference" else 0.0
    dyx = np.asarray(offs, np.float32)
    di = (ci[:, None].astype(x.dtype) + dyx[None, :, 1] + half) - x[:, None]
    dj = (cj[:, None].astype(y.dtype) + dyx[None, :, 0] + half) - y[:, None]
    d2 = di * di + dj * dj
    m = len(offs)
    ok = ~jnp.isnan(st[:, :m])
    neg = jnp.where(ok, -d2, -jnp.inf)
    top_neg, top_idx = jax.lax.top_k(neg, k)
    slot_ok = jnp.isfinite(top_neg)
    # select via one-hot contraction: take_along_axis lowers to a minor-dim
    # gather (~17ns/elem on TPU); the (N,k,m) one-hot einsum fuses instead
    oh = (
        top_idx[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    ).astype(st.dtype)
    pick = lambda a: jnp.einsum("nkm,nm->nk", oh, a)
    vals = jnp.where(slot_ok, pick(jnp.where(ok, st[:, :m], 0.0)), 0.0)
    sel_dy = pick(jnp.broadcast_to(dyx[None, :, 0], d2.shape))
    sel_dx = pick(jnp.broadcast_to(dyx[None, :, 1], d2.shape))
    return {
        "x": x, "y": y, "oob": oob, "ci": ci, "cj": cj,
        "val": vals, "d2": -top_neg, "slot_ok": slot_ok,
        "found": slot_ok.sum(axis=1).astype(jnp.int32),
        "dy": sel_dy, "dx": sel_dx,
    }


@partial(jax.jit, static_argnames=("window_radius", "convention"))
def packed_kriging(pack, grid: RegularGrid, lons, lats, *, window_radius: int = 2, vparams=None, convention: str = "reference"):
    from ..config import KrigingConfig
    from .scattered import krige_solve
    from .window import masked_mean

    sel = packed_window_select(pack, grid, lons, lats, k=4, window_radius=window_radius, convention=convention)
    dt = grid.dtype
    half = 0.5 if convention == "reference" else 0.0
    lon_step = jnp.asarray(grid.lon_step, dt)
    lat_step = jnp.asarray(grid.lat_step, dt)
    cx = grid.min_lon + (sel["ci"][:, None].astype(dt) + sel["dx"] + half) * lon_step
    cy = grid.min_lat + (sel["cj"][:, None].astype(dt) + sel["dy"] + half) * lat_step
    pred, singular = krige_solve(
        jnp.asarray(lons, dt), jnp.asarray(lats, dt), sel["val"], cx, cy,
        KrigingConfig(), vparams=vparams,
    )
    fb = masked_mean(jnp.where(sel["slot_ok"], sel["val"], jnp.nan), sel["slot_ok"])
    out = jnp.where(singular | (sel["found"] < 4), fb, pred)
    return jnp.where(sel["oob"], jnp.nan, out)


@partial(jax.jit, static_argnames=("k", "power", "window_radius", "convention"))
def packed_idw(pack, grid: RegularGrid, lons, lats, *, k: int = 8, power: float = 2.0, window_radius: int = 2, convention: str = "reference"):
    from ..config import IDWConfig

    cfg = IDWConfig(k=k, power=power)
    sel = packed_window_select(pack, grid, lons, lats, k=k, window_radius=window_radius, convention=convention)
    w = jnp.where(sel["slot_ok"], 1.0 / (sel["d2"] ** (power / 2.0) + cfg.eps), 0.0)
    ws = w.sum(axis=1)
    out = jnp.where(ws > 0, (w * sel["val"]).sum(axis=1) / jnp.maximum(ws, cfg.eps), jnp.nan)
    return jnp.where(sel["oob"], jnp.nan, out)
