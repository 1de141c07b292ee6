"""Transposed fused top-4 selection for the fully-valid kriging fast path.

The XLA valid16 path (ops.packs.packed_kriging_valid) measures 46.8 ms at
5M queries against a 26.5 ms row-fetch floor; the residue is top_k + two
(N,4,16) one-hot picks (results/select_probe_r3.txt).  Two fused-select
attempts LOST: scattered_select.py keeps queries on sublanes, so every VPU
op spans 128 lanes with one live 16-lane sub-block and the 4-slot
min-extract serializes full-width passes; an in-kernel-transpose variant
(P=128 pack + per-chunk (128,128) transposes) measured 45 ms for the
select alone — the transposes ate the savings.

This kernel receives the stencil PRE-transposed: XLA does the (N,16) row
fetch + sub-block pick (the measured fetch floor) with the one-hot einsum
writing the (16, N) layout directly; the kernel then sees (16, tile_n)
blocks whose minor dim is the 128-aligned query axis — candidates on
SUBLANES, queries on LANES.  The whole selection is (16, tn) vector ops:
a 4-slot min-extract costs ~6 sublane-reduces per slot across tn queries,
with no transposes and no sub-block masking.  Output is emitted
pre-transposed as a (13, N) tensor [cnt, 4xval, 4xd2, 4xcode] (or (9, N)
without the d2 rows for the kriging path, which recomputes distances from
the codes inside the solve).

The kriging epilogue consumes the row tensor AS IS: rows 1-4 are the
per-slot value vectors and rows 5-8 decode to per-slot cell coords, which
feed ops.scattered.krige_solve_cols (the column-form Gauss-Jordan) with
zero relayout — no (13,N)->(N,4) transposes anywhere in the fast path.

Tie order: candidates sit on sublanes in VALID16_OFFSETS (collection)
order and the min-extract takes the lowest achieving sublane — identical
to lax.top_k over the same table, so selection (and ties) match
packed_kriging_valid exactly (pinned by
tests/test_pallas.py::test_valid_select_t_matches_valid16).

Reference behavior reproduced: kernels.cu:403-546 in the all-valid case.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import RegularGrid
from ..ops.packs import (
    _SENTINEL,
    VALID16_OFFSETS,
    _normalize,
    fetch_pack,
)

_LANES = 128
_INF = np.float32(3e30)
_R = 2
_B = 2 * _R + 2  # code base


def _tables(tn: int):
    dyx = np.asarray(VALID16_OFFSETS, np.float32)  # (16, 2) (dy, dx)
    dy = np.broadcast_to(dyx[:, 0:1], (16, tn)).copy()
    dx = np.broadcast_to(dyx[:, 1:2], (16, tn)).copy()
    code = (dyx[:, 0:1] + _R) * _B + (dyx[:, 1:2] + _R)
    code = np.broadcast_to(code, (16, tn)).copy()
    return dy, dx, code


def _kernel(stT_ref, fxy_ref, dy_ref, dx_ref, code_ref, out_ref, *, emit_d2):
    cand = stT_ref[:]  # (16, tn): candidates on sublanes, queries on lanes
    fx = fxy_ref[0:1, :]
    fy = fxy_ref[1:2, :]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    ok = cand < 0.5 * _SENTINEL
    di = (dx_ref[:] + 0.5) - fx
    dj = (dy_ref[:] + 0.5) - fy
    d2 = jnp.where(ok, di * di + dj * dj, _INF)
    code = code_ref[:]
    cnt = jnp.zeros((1, cand.shape[1]), jnp.float32)
    vals, d2s, codes = [], [], []
    for _s in range(4):
        m = jnp.min(d2, axis=0, keepdims=True)
        got = m < 0.5 * _INF
        smin = jnp.min(
            jnp.where(d2 == m, sub_iota, 2 * _LANES), axis=0, keepdims=True
        )
        hit = (sub_iota == smin) & got
        hf = hit.astype(jnp.float32)
        vals.append(jnp.sum(cand * hf, axis=0, keepdims=True))
        if emit_d2:
            d2s.append(jnp.where(got, m, _INF))
        codes.append(jnp.sum(code * hf, axis=0, keepdims=True))
        cnt = cnt + got.astype(jnp.float32)
        d2 = jnp.where(hit, _INF, d2)
    out_ref[:, :] = jnp.concatenate([cnt] + vals + d2s + codes, axis=0)


def _select_rows(pack16, grid: RegularGrid, lons, lats, tile_n: int, emit_d2: bool):
    """Shared prologue + kernel launch: returns ((rows, N_valid), x, y, oob,
    ci, cj) with rows = (13, n_pad) [cnt, val*4, d2*4, code*4] when emit_d2
    else (9, n_pad) [cnt, val*4, code*4]."""
    import jax.experimental.pallas as pl

    if grid.dtype == jnp.float64:
        raise ValueError("valid_select_t is an f32 kernel; use packed_kriging_valid")
    W, H = grid.num_lon, grid.num_lat
    x, y, oob = _normalize(grid, lons, lats)
    ci = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, W - 1)
    cj = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, H - 1)
    f32 = jnp.float32
    # one-hot einsum writes the (16, N) lanes-major layout directly — no
    # separate transpose pass (fetch_pack transposed=True).  NOTE a
    # pad-the-queries-first variant (tile-aligning lons/lats so stT is born
    # aligned) measured 69 ms vs this version's 41 at 5M — the index pad
    # de-optimizes the gather composition; keep the post-fetch stT pad.
    stT = fetch_pack(
        pack16, 16, cj * W + ci, nan_invalid=False, transposed=True
    ).astype(f32)
    fxy = jnp.stack(
        [(x - ci.astype(x.dtype)).astype(f32), (y - cj.astype(y.dtype)).astype(f32)],
        axis=0,
    )  # (2, N)
    n = stT.shape[1]
    tn = tile_n
    n_pad = (-n) % tn
    if n_pad:
        stT = jnp.pad(stT, ((0, 0), (0, n_pad)), constant_values=_SENTINEL)
        fxy = jnp.pad(fxy, ((0, 0), (0, n_pad)))
    n_tot = stT.shape[1]
    dy_t, dx_t, code_t = _tables(tn)
    rows = 13 if emit_d2 else 9

    out = pl.pallas_call(
        partial(_kernel, emit_d2=emit_d2),
        out_shape=jax.ShapeDtypeStruct((rows, n_tot), f32),
        grid=(n_tot // tn,),
        in_specs=[
            pl.BlockSpec((16, tn), lambda i: (0, i)),
            pl.BlockSpec((2, tn), lambda i: (0, i)),
            pl.BlockSpec((16, tn), lambda i: (0, 0)),
            pl.BlockSpec((16, tn), lambda i: (0, 0)),
            pl.BlockSpec((16, tn), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, tn), lambda i: (0, i)),
    )(stT, fxy, jnp.asarray(dy_t), jnp.asarray(dx_t), jnp.asarray(code_t))
    return out, n, x, y, oob, ci, cj, lons, lats


@partial(jax.jit, static_argnames=("tile_n",))
def valid_select_t(pack16, grid: RegularGrid, lons, lats, *, tile_n: int = 2048):
    """Transposed fused valid-grid top-4: same select dict as
    ops.packs.select_from_stencil over VALID16_OFFSETS."""
    out, n, x, y, oob, ci, cj, _, _ = _select_rows(
        pack16, grid, lons, lats, tile_n, emit_d2=True
    )
    out = out[:, :n]
    dt = grid.dtype
    found = out[0].astype(jnp.int32)
    vals = out[1:5].T.astype(dt)  # (N, 4)
    d2 = out[5:9].T.astype(dt)
    code = jnp.maximum(out[9:13].T, 0.0)
    slot_ok = jax.lax.broadcasted_iota(jnp.int32, (n, 4), 1) < found[:, None]
    sdy = jnp.floor(code / _B) - _R
    sdx = code - (sdy + _R) * _B - _R
    return {
        "x": x, "y": y, "oob": oob, "ci": ci, "cj": cj,
        "val": vals, "d2": d2, "slot_ok": slot_ok, "found": found,
        "dy": sdy.astype(dt), "dx": sdx.astype(dt),
    }


@partial(jax.jit, static_argnames=("tile_n", "model"))
def pallas_kriging_valid(pack16, grid: RegularGrid, lons, lats, *, vparams=None, tile_n: int = 2048, model: str = "exponential"):
    """Transposed-select drop-in for ops.packs.packed_kriging_valid (fully-
    valid grids, reference convention).  The whole epilogue stays in row
    (lanes-major) layout: kernel rows feed krige_solve_cols directly."""
    from ..config import KrigingConfig
    from ..ops.scattered import krige_solve_cols

    out, n, x, y, oob, ci, cj, lons_p, lats_p = _select_rows(
        pack16, grid, lons, lats, tile_n, emit_d2=False
    )
    out = out[:, :n]
    dt = grid.dtype
    found = out[0]  # float counts; integer-valued
    vals_c = [out[1 + a].astype(dt) for a in range(4)]
    lon_step = jnp.asarray(grid.lon_step, dt)
    lat_step = jnp.asarray(grid.lat_step, dt)
    ci_f = ci.astype(dt)
    cj_f = cj.astype(dt)
    cx_c, cy_c = [], []
    for a in range(4):
        code = jnp.maximum(out[5 + a], 0.0).astype(dt)
        sdy = jnp.floor(code / _B) - _R
        sdx = code - (sdy + _R) * _B - _R
        cx_c.append(grid.min_lon + (ci_f + sdx + 0.5) * lon_step)
        cy_c.append(grid.min_lat + (cj_f + sdy + 0.5) * lat_step)
    pred, singular = krige_solve_cols(
        jnp.asarray(lons_p, dt), jnp.asarray(lats_p, dt), vals_c, cx_c, cy_c,
        KrigingConfig(), vparams=vparams, model=model,
    )
    # invalid slots carry val=0 (all-zero one-hot), so sum/count == the
    # masked mean the packed path uses for its <4-neighbor fallback
    fb = (vals_c[0] + vals_c[1] + vals_c[2] + vals_c[3]) / jnp.maximum(found, 1.0)
    res = jnp.where(singular | (found < 3.5), fb, pred)
    return jnp.where(oob, jnp.nan, res)
