"""Fused scattered select+solve Pallas kernels over gathered pack rows.

The packed scattered path (ops/packs.py) is two-phase: one (N, 128) row
fetch (the measured fetch floor, ~6 ns/row on v5e), then an XLA top_k +
one-hot-einsum selection and a Gauss-Jordan solve — several more (N, 128)
and (N, k, P) HBM-materialized passes that cost about as much as the fetch
itself (docs/NEXTSTEPS.md perf lead #1).

These kernels keep the XLA row gather (random per-query rows cannot be
block-DMA'd) but fuse EVERYTHING after it — per-lane d2 build, k-pass
min-extract with first-lane tie-breaking, and the 5x6 ordinary-kriging
Gauss-Jordan (or IDW weighting) — into one VMEM pass over each (TN, 128)
tile of gathered rows.  One HBM read of the rows, one (N, 1) write.

Semantics match ops.packs.packed_kriging / packed_idw (v2 selection in the
pack's static-distance order; ties at equal actual d2 break to the lowest
lane index, exactly like lax.top_k — see docs/SEMANTICS.md tie-order note).

Reference behavior being reproduced: kernels.cu:403-546 (kriging),
kernels.cu:240-330 (IDW) — selection + per-query solve on the device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IDWConfig, KrigingConfig
from ..grid import RegularGrid
from ..ops.packs import _SENTINEL, _row_fetch, window_offsets

_LANES = 128
_INF = np.float32(3e30)


def _lane_tables(window_radius: int, P: int):
    """Per-lane static (dy, dx, code) tables replicated across the 128/P
    sub-blocks; dead (padding) lanes get code -1 and a huge offset so their
    d2 is never selected even if a stray finite value appears."""
    offs = window_offsets(window_radius)
    R = window_radius
    B = 2 * R + 2
    dy = np.full((_LANES,), 1e4, np.float32)
    dx = np.full((_LANES,), 1e4, np.float32)
    code = np.full((_LANES,), -1.0, np.float32)
    for lane in range(_LANES):
        j = lane % P
        if j < len(offs):
            oy, ox = offs[j]
            dy[lane] = oy
            dx[lane] = ox
            code[lane] = (ox + R) * B + (oy + R)
    return dy.reshape(1, -1), dx.reshape(1, -1), code.reshape(1, -1), B


def _make_select_kernel(kind: str, k: int, P: int, tn: int, B: int, R: int):
    import jax.experimental.pallas as pl  # noqa: F401

    g = _LANES // P

    def kernel(par_ref, rd_ref, qm_ref, dy_ref, dx_ref, code_ref, out_ref):
        half = par_ref[0]
        rd = rd_ref[:]
        fx = qm_ref[:, 0:1]
        fy = qm_ref[:, 1:2]
        sub = qm_ref[:, 2:3]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tn, _LANES), 1).astype(jnp.float32)
        mine = jnp.floor(lane * (1.0 / P)) == sub
        ok = mine & (rd < 0.5 * _SENTINEL)
        # actual squared distance in cell units (packs.py:270-273)
        di = (dx_ref[:] + half) - fx
        dj = (dy_ref[:] + half) - fy
        d2 = jnp.where(ok, di * di + dj * dj, _INF)

        vals, codes, d2s, gots = [], [], [], []
        for _s in range(k):
            m = jnp.min(d2, axis=1, keepdims=True)
            got = m < 0.5 * _INF
            # first (lowest-index) lane achieving the min — lax.top_k's
            # tie order, so parity with packed_window_select is exact
            lmin = jnp.min(jnp.where(d2 == m, lane, 2.0 * _LANES), axis=1, keepdims=True)
            hit = (lane == lmin) & got
            hf = hit.astype(jnp.float32)
            vals.append(jnp.sum(rd * hf, axis=1, keepdims=True))
            gots.append(got.astype(jnp.float32))
            d2s.append(m)
            if kind == "kriging":
                codes.append(jnp.sum(code_ref[:] * hf, axis=1, keepdims=True))
            d2 = jnp.where(hit, _INF, d2)

        cnt = sum(gots)
        vz = [v * gt for v, gt in zip(vals, gots)]  # zero empty slots
        if kind == "idw":
            power = par_ref[1]
            eps = par_ref[2]
            ws = jnp.zeros((tn, 1), jnp.float32)
            vsum = jnp.zeros((tn, 1), jnp.float32)
            for s in range(k):
                d2c = jnp.maximum(d2s[s], 0.0)
                # d2 ** (power/2) via exp/log (no powf in Mosaic); d2 == 0
                # -> 0, matching d2**q -> 0
                q = 0.5 * power
                dpq = jnp.where(
                    d2c > 0.0, jnp.exp(q * jnp.log(jnp.maximum(d2c, 1e-37))), 0.0
                )
                w = gots[s] / (dpq + eps)
                ws = ws + w
                vsum = vsum + w * vz[s]
            out = jnp.where(cnt > 0, vsum / jnp.maximum(ws, eps), jnp.nan)
        else:
            nugget = par_ref[1]
            sill = par_ref[2]
            vrange = par_ref[3]
            min_lon = par_ref[4]
            min_lat = par_ref[5]
            lon_step = par_ref[6]
            lat_step = par_ref[7]
            pivot_tol = par_ref[8]
            ci = qm_ref[:, 3:4]
            cj = qm_ref[:, 4:5]
            qlon = qm_ref[:, 5:6]
            qlat = qm_ref[:, 6:7]

            cx, cy = [], []
            for s in range(k):
                c_ = jnp.maximum(codes[s], 0.0)
                dxs = jnp.floor(c_ * (1.0 / B))
                dys = c_ - dxs * B - R
                dxs = dxs - R
                cx.append(min_lon + (ci + dxs + half) * lon_step)
                cy.append(min_lat + (cj + dys + half) * lat_step)

            def gamma(h):
                return nugget + sill * (1.0 - jnp.exp(-h / vrange))

            one = jnp.ones((tn, 1), jnp.float32)
            zero = jnp.zeros((tn, 1), jnp.float32)
            M = [[None] * 6 for _ in range(5)]
            for a in range(4):
                for b in range(4):
                    if b < a:
                        M[a][b] = M[b][a]
                        continue
                    ddx = cx[a] - cx[b]
                    ddy = cy[a] - cy[b]
                    M[a][b] = gamma(jnp.sqrt(ddx * ddx + ddy * ddy))
                M[a][4] = one
                ddx = cx[a] - qlon
                ddy = cy[a] - qlat
                M[a][5] = gamma(jnp.sqrt(ddx * ddx + ddy * ddy))
            M[4] = [one, one, one, one, zero, one]

            singular = jnp.zeros((tn, 1), bool)
            for p_ in range(5):
                pivot = M[p_][p_]
                singular = singular | (jnp.abs(pivot) < pivot_tol)
                safe = jnp.where(singular, 1.0, pivot)
                for q in range(p_, 6):
                    M[p_][q] = M[p_][q] / safe
                for r_ in range(5):
                    if r_ == p_:
                        continue
                    f = M[r_][p_]
                    for q in range(p_, 6):
                        M[r_][q] = M[r_][q] - f * M[p_][q]

            pred = M[0][5] * vz[0] + M[1][5] * vz[1] + M[2][5] * vz[2] + M[3][5] * vz[3]
            fb = jnp.where(cnt > 0, (vz[0] + vz[1] + vz[2] + vz[3]) / jnp.maximum(cnt, 1.0), jnp.nan)
            out = jnp.where(singular | (cnt < k), fb, pred)

        oob = qm_ref[:, 7:8] > 0.5
        out_ref[:] = jnp.where(oob, jnp.nan, out)

    return kernel


def _prepare(pack, grid: RegularGrid, lons, lats, P: int, tn: int):
    from ..ops.packs import _normalize

    x, y, oob = _normalize(grid, lons, lats)
    ci = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, grid.num_lon - 1)
    cj = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, grid.num_lat - 1)
    rd, sub = _row_fetch(pack, cj * grid.num_lon + ci, P)
    f32 = jnp.float32
    qm = jnp.stack(
        [
            (x - ci.astype(x.dtype)).astype(f32),
            (y - cj.astype(y.dtype)).astype(f32),
            sub.astype(f32),
            ci.astype(f32),
            cj.astype(f32),
            jnp.asarray(lons, f32),
            jnp.asarray(lats, f32),
            oob.astype(f32),
        ],
        axis=1,
    )
    n = qm.shape[0]
    n_pad = (-n) % tn
    if n_pad:
        rd = jnp.pad(rd.astype(f32), ((0, n_pad), (0, 0)), constant_values=_SENTINEL)
        qm = jnp.pad(qm, ((0, n_pad), (0, 0)))
    else:
        rd = rd.astype(f32)
    return rd, qm, n


def _run(kind, pack, grid, lons, lats, *, k, window_radius, convention, par_tail, tn):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offs = window_offsets(window_radius)
    P = 1
    while P < len(offs):
        P *= 2
    dy_tab, dx_tab, code_tab, B = _lane_tables(window_radius, P)
    rd, qm, n = _prepare(pack, grid, lons, lats, P, tn)
    half = 0.5 if convention == "reference" else 0.0
    # par_tail may hold traced scalars (fitted variogram params)
    par = jnp.stack(
        [jnp.asarray(v, jnp.float32).reshape(()) for v in [half] + list(par_tail)]
    )

    kernel = _make_select_kernel(kind, k, P, tn, B, window_radius)
    n_tiles = rd.shape[0] // tn
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tn, _LANES), lambda i, *_: (i, 0)),
            pl.BlockSpec((tn, 8), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, _LANES), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, _LANES), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, _LANES), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tn, 1), lambda i, *_: (i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rd.shape[0], 1), jnp.float32),
        grid_spec=grid_spec,
    )(
        par,
        rd,
        qm,
        jnp.asarray(dy_tab),
        jnp.asarray(dx_tab),
        jnp.asarray(code_tab),
    )
    return out[:n, 0]


@partial(jax.jit, static_argnames=("window_radius", "convention", "tile_n"))
def pallas_packed_kriging(
    pack,
    grid: RegularGrid,
    lons,
    lats,
    *,
    window_radius: int = 2,
    vparams=None,
    convention: str = "reference",
    tile_n: int = 1024,
):
    """Fused drop-in for ops.packs.packed_kriging (kernels.cu:403-546):
    one row fetch, then selection + Gauss-Jordan entirely in VMEM."""
    cfg = KrigingConfig()
    if vparams is None:
        vparams = (cfg.variogram.nugget, cfg.variogram.sill, cfg.variogram.range)
    par_tail = [
        vparams[0], vparams[1], vparams[2],
        grid.min_lon, grid.min_lat, grid.lon_step, grid.lat_step,
        cfg.pivot_tol,
    ]
    return _run(
        "kriging", pack, grid, lons, lats,
        k=4, window_radius=window_radius, convention=convention,
        par_tail=par_tail, tn=tile_n,
    ).astype(grid.dtype)


@partial(jax.jit, static_argnames=("k", "power", "window_radius", "convention", "tile_n"))
def pallas_packed_idw(
    pack,
    grid: RegularGrid,
    lons,
    lats,
    *,
    k: int = 8,
    power: float = 2.0,
    window_radius: int = 2,
    convention: str = "reference",
    tile_n: int = 1024,
):
    """Fused drop-in for ops.packs.packed_idw (kernels.cu:240-330)."""
    cfg = IDWConfig(k=k, power=power)
    return _run(
        "idw", pack, grid, lons, lats,
        k=k, window_radius=window_radius, convention=convention,
        par_tail=[power, cfg.eps], tn=tile_n,
    ).astype(grid.dtype)
