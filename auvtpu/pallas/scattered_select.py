"""Fused scattered k-nearest selection Pallas kernel over gathered pack rows.

The packed scattered path (ops/packs.py) is two-phase: one (N, 128) row
fetch (the measured fetch floor, ~6 ns/row on v5e), then an XLA top_k +
one-hot-einsum selection costing several more HBM-materialized (N, 128) and
(N, k, P) passes — about as much as the fetch itself (docs/NEXTSTEPS.md
perf lead #1).

This kernel keeps the XLA row gather (random per-query rows cannot be
block-DMA'd) and fuses everything SELECTION-side after it — per-lane d2
build, k-pass min-extract with first-lane tie-breaking — into one VMEM pass
per (TN, 128) tile, emitting a compact (N, 1+3k) select tensor
[cnt, vals, d2s, codes].  The kriging solve / IDW weighting stay in XLA on
(N, k) vectors: a 5x6 Gauss-Jordan on (TN, 1) planes inside the kernel
would idle 127/128 VPU lanes (~25 vreg-ops/query), while XLA fuses the same
~200 elementwise ops into one full-occupancy kernel (~1.5 ms at 5M).

Semantics match ops.packs.packed_window_select exactly (v2 selection over
the collection-ordered pack; ties at equal actual d2 break to the lowest
lane index = collection order, same as lax.top_k over the same table), so
the downstream math is literally shared: kriging_from_select /
idw_from_select.

Reference behavior being reproduced: kernels.cu:403-546 (kriging selection),
kernels.cu:240-330 (IDW) — per-query neighbor search on the device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IDWConfig
from ..grid import RegularGrid
from ..ops.packs import (
    _SENTINEL,
    _row_fetch,
    idw_from_select,
    kriging_from_select,
    window_offsets,
)

_LANES = 128
_INF = np.float32(3e30)


def _lane_tables(window_radius: int, P: int):
    """Per-lane static (dy, dx, code) tables replicated across the 128/P
    sub-blocks; dead (padding) lanes get a huge offset so their d2 is never
    selected even if a stray finite value appears."""
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


def _make_select_kernel(k: int, P: int, tn: int):
    import jax.experimental.pallas as pl  # noqa: F401

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

        cols = [None]  # slot 0 = cnt, filled below
        cnt = jnp.zeros((tn, 1), jnp.float32)
        vals, d2s, codes = [], [], []
        for _s in range(k):
            m = jnp.min(d2, axis=1, keepdims=True)
            got = m < 0.5 * _INF
            # first (lowest-index) lane achieving the min — lax.top_k's tie
            # order, so parity with packed_window_select is exact
            lmin = jnp.min(
                jnp.where(d2 == m, lane, 2.0 * _LANES), axis=1, keepdims=True
            )
            hit = (lane == lmin) & got
            hf = hit.astype(jnp.float32)
            vals.append(jnp.sum(rd * hf, axis=1, keepdims=True))
            d2s.append(m)
            codes.append(jnp.sum(code_ref[:] * hf, axis=1, keepdims=True))
            cnt = cnt + got.astype(jnp.float32)
            d2 = jnp.where(hit, _INF, d2)

        cols[0] = cnt
        out_ref[:] = jnp.concatenate(cols + vals + d2s + codes, axis=1)

    return kernel


@partial(jax.jit, static_argnames=("k", "window_radius", "convention", "tile_n"))
def pallas_window_select(
    pack,
    grid: RegularGrid,
    lons,
    lats,
    *,
    k: int,
    window_radius: int = 2,
    convention: str = "reference",
    tile_n: int = 1024,
):
    """Drop-in for ops.packs.packed_window_select with the selection fused
    into one VMEM pass.  Returns the same select dict."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops.packs import _normalize

    offs = window_offsets(window_radius)
    P = 1
    while P < len(offs):
        P *= 2
    dy_tab, dx_tab, code_tab, B = _lane_tables(window_radius, P)
    R = window_radius

    if grid.dtype == jnp.float64:
        # the kernel computes in f32; silently downcasting an x64 grid would
        # be exactly the silent-precision-regression class the bf16 incident
        # was (docs/RESULTS.md) — refuse loudly, the XLA packed path serves
        # x64 callers
        raise ValueError(
            "pallas_window_select is an f32 kernel; use the 'xla' packed "
            "backend for float64 grids"
        )
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
            jnp.zeros_like(x, f32),
        ],
        axis=1,
    )
    n = qm.shape[0]
    tn = tile_n
    n_pad = (-n) % tn
    rd = rd.astype(f32)
    if n_pad:
        rd = jnp.pad(rd, ((0, n_pad), (0, 0)), constant_values=_SENTINEL)
        qm = jnp.pad(qm, ((0, n_pad), (0, 0)))

    half = 0.5 if convention == "reference" else 0.0
    par = jnp.asarray([half], f32)
    outw = 1 + 3 * k

    kernel = _make_select_kernel(k, P, tn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rd.shape[0] // tn,),
        in_specs=[
            pl.BlockSpec((tn, _LANES), lambda i, *_: (i, 0)),
            pl.BlockSpec((tn, 4), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, _LANES), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, _LANES), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, _LANES), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tn, outw), lambda i, *_: (i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rd.shape[0], outw), f32),
        grid_spec=grid_spec,
    )(par, rd, qm, jnp.asarray(dy_tab), jnp.asarray(dx_tab), jnp.asarray(code_tab))
    out = out[:n]

    found = out[:, 0].astype(jnp.int32)
    vals = out[:, 1 : 1 + k]
    d2 = out[:, 1 + k : 1 + 2 * k]
    code = out[:, 1 + 2 * k : 1 + 3 * k]
    slot_ok = jax.lax.broadcasted_iota(jnp.int32, (n, k), 1) < found[:, None]
    c_ = jnp.maximum(code, 0.0)
    dxs = jnp.floor(c_ * (1.0 / B))
    dys = c_ - dxs * B - R
    dxs = dxs - R
    dt = grid.dtype
    return {
        "x": x, "y": y, "oob": oob, "ci": ci, "cj": cj,
        "val": vals.astype(dt), "d2": d2.astype(dt), "slot_ok": slot_ok,
        "found": found,
        "dy": dys.astype(dt), "dx": dxs.astype(dt),
    }


@partial(jax.jit, static_argnames=("window_radius", "convention", "tile_n", "model"))
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
    model: str = "exponential",
):
    """Fused-selection drop-in for ops.packs.packed_kriging
    (kernels.cu:403-546); the 5x6 solve runs in XLA via the shared
    kriging_from_select."""
    sel = pallas_window_select(
        pack, grid, lons, lats,
        k=4, window_radius=window_radius, convention=convention, tile_n=tile_n,
    )
    return kriging_from_select(
        grid, lons, lats, sel, vparams=vparams, convention=convention, model=model
    )


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
    """Fused-selection drop-in for ops.packs.packed_idw (kernels.cu:240-330)."""
    cfg = IDWConfig(k=k, power=power)
    sel = pallas_window_select(
        pack, grid, lons, lats,
        k=k, window_radius=window_radius, convention=convention, tile_n=tile_n,
    )
    return idw_from_select(sel, power=power, eps=cfg.eps)
