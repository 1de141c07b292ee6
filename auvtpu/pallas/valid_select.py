"""Transposed (queries-on-lanes) fused top-k selection kernels.

The XLA packed paths (ops.packs) pay top_k + one-hot-pick passes over the
fetched stencils; the fetch itself is gather-unit row-count-bound (26.5 ms
at 5M = the floor, results/valid_t_breakdown_r3.txt).  Two fused-select
attempts LOST: scattered_select.py keeps queries on sublanes, so every VPU
op spans 128 lanes with one live sub-block and the k-slot min-extract
serializes full-width passes; an in-kernel-transpose variant (P=128 pack +
per-chunk (128,128) transposes) measured 45 ms for the select alone — the
transposes ate the savings.

These kernels receive the stencil PRE-transposed: XLA does the (N,128) row
fetch + sub-block pick with the one-hot einsum writing the (P, N) layout
directly (measured free vs (N, P)); the kernel then sees (P, tile_n)
blocks whose minor dim is the 128-aligned query axis — candidates on
SUBLANES, queries on LANES.  The whole selection is (P, tn) vector ops: a
k-slot min-extract costs ~6 sublane-reduces per slot across tn queries,
with no transposes and no sub-block masking.

Outputs stay in row (lanes-major) layout end to end:
- the select emits (1+2k[+k], N) rows [cnt, k*val, (k*d2,) k*code] whose
  rows ARE the per-slot vectors — they feed ops.scattered.krige_solve_cols
  (column-form Gauss-Jordan) with zero relayout;
- the IDW kernel folds the whole weighted reduction in-kernel and emits
  just (2, N) [sum w*v, sum w].

Tie order: candidates sit on sublanes in collection (reference) order and
the min-extract takes the lowest achieving sublane — identical to
lax.top_k over the same table, so selection (and ties) match the packed
XLA paths exactly (pinned by tests/test_pallas.py).

Variants:
- pallas_kriging_valid: 16-lane {-2..1}^2 pack, FULLY-VALID grids only
  (containment proof in ops.packs.packed_kriging_valid).  120.4 M pts/s at
  5M vs 107 for the XLA valid16 path (chip, bit-exact).
- pallas_packed_kriging_t / pallas_packed_idw_t: full window pack (P=32
  for radius 2), ANY grid (masked included) — drop-ins for
  ops.packs.packed_kriging / packed_idw.

Reference behavior reproduced: kernels.cu:403-546 (kriging window
selection + solve); IDW is the BASELINE.json north-star kernel.
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
    window_offsets,
)

_LANES = 128
_INF = np.float32(3e30)


def _sel_tables(offs, P: int, R: int, tn: int):
    """(P, tn) dy / dx / composite-code tables; dead rows (len(offs)..P)
    carry zeros — the pack fills their taps with the sentinel, so the
    validity mask kills them before the tables matter."""
    B = 2 * R + 2
    dyx = np.zeros((P, 2), np.float32)
    dyx[: len(offs)] = np.asarray(offs, np.float32)
    dy = np.broadcast_to(dyx[:, 0:1], (P, tn)).copy()
    dx = np.broadcast_to(dyx[:, 1:2], (P, tn)).copy()
    code = (dyx[:, 0:1] + R) * B + (dyx[:, 1:2] + R)
    code = np.broadcast_to(code, (P, tn)).copy()
    return dy, dx, code


def _sel_kernel(stT_ref, fxy_ref, dy_ref, dx_ref, code_ref, out_ref, *, k, emit_d2, half=0.5, resolve_thresh=None):
    cand = stT_ref[:]  # (P, tn): candidates on sublanes, queries on lanes
    fx = fxy_ref[0:1, :]
    fy = fxy_ref[1:2, :]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    ok = cand < 0.5 * _SENTINEL
    di = (dx_ref[:] + half) - fx
    dj = (dy_ref[:] + half) - fy
    d2 = jnp.where(ok, di * di + dj * dj, _INF)
    code = code_ref[:]
    cnt = jnp.zeros((1, cand.shape[1]), jnp.float32)
    vals, d2s, codes = [], [], []
    resolved = []
    for _s in range(k):
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
        if resolve_thresh is not None and _s == k - 1:
            # two-tier resolution: all k found AND the k-th nearest beats
            # the closest conceivable outside-window cell (two_tier.py)
            resolved = [(got & (m < resolve_thresh)).astype(jnp.float32)]
    out_ref[:, :] = jnp.concatenate([cnt] + vals + d2s + codes + resolved, axis=0)


def _idw_kernel(stT_ref, fxy_ref, dy_ref, dx_ref, out_ref, *, k, inv_eps, half=0.5, resolve_thresh=None):
    """k-nearest IDW (power=2) fully in-kernel: k-slot min-extract with
    running weight accumulation; emits (2, tn) [sum w*v, sum w]."""
    cand = stT_ref[:]
    fx = fxy_ref[0:1, :]
    fy = fxy_ref[1:2, :]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    ok = cand < 0.5 * _SENTINEL
    di = (dx_ref[:] + half) - fx
    dj = (dy_ref[:] + half) - fy
    d2 = jnp.where(ok, di * di + dj * dj, _INF)
    num = jnp.zeros((1, cand.shape[1]), jnp.float32)
    den = jnp.zeros((1, cand.shape[1]), jnp.float32)
    for _s in range(k):
        m = jnp.min(d2, axis=0, keepdims=True)
        got = m < 0.5 * _INF
        smin = jnp.min(
            jnp.where(d2 == m, sub_iota, 2 * _LANES), axis=0, keepdims=True
        )
        hit = (sub_iota == smin) & got
        hf = hit.astype(jnp.float32)
        val = jnp.sum(cand * hf, axis=0, keepdims=True)
        w = jnp.where(got, 1.0 / (m + inv_eps), 0.0)
        num = num + w * val
        den = den + w
        d2 = jnp.where(hit, _INF, d2)
        if resolve_thresh is not None and _s == k - 1:
            resolved = [(got & (m < resolve_thresh)).astype(jnp.float32)]
    out_ref[:, :] = jnp.concatenate(
        [num, den] + (resolved if resolve_thresh is not None else []), axis=0
    )


def _prologue(pack, P: int, grid: RegularGrid, lons, lats, tile_n: int):
    """Shared fetch: transposed (P, N_padded) stencil + (2, N_padded)
    fractional offsets + query geometry."""
    if grid.dtype == jnp.float64:
        raise ValueError("transposed select kernels are f32; use the ops.packs paths")
    W, H = grid.num_lon, grid.num_lat
    x, y, oob = _normalize(grid, lons, lats)
    ci = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, W - 1)
    cj = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, H - 1)
    f32 = jnp.float32
    # one-hot einsum writes the (P, N) lanes-major layout directly — no
    # separate transpose pass (fetch_pack transposed=True).  NOTE a
    # pad-the-queries-first variant (tile-aligning lons/lats so stT is born
    # aligned) measured 69 ms vs this version's 41 at 5M — the index pad
    # de-optimizes the gather composition; keep the post-fetch stT pad.
    stT = fetch_pack(
        pack, P, cj * W + ci, nan_invalid=False, transposed=True
    ).astype(f32)
    fxy = jnp.stack(
        [(x - ci.astype(x.dtype)).astype(f32), (y - cj.astype(y.dtype)).astype(f32)],
        axis=0,
    )
    n = stT.shape[1]
    n_pad = (-n) % tile_n
    if n_pad:
        stT = jnp.pad(stT, ((0, 0), (0, n_pad)), constant_values=_SENTINEL)
        fxy = jnp.pad(fxy, ((0, 0), (0, n_pad)))
    return stT, fxy, n, x, y, oob, ci, cj


def _select_rows(pack, P, offs, R, grid, lons, lats, tile_n, emit_d2, k=4, half=0.5, resolve_thresh=None):
    """Select-kernel launch: (1+2k(+k), n_padded) rows
    [cnt, k*val, (k*d2,) k*code]."""
    import jax.experimental.pallas as pl

    stT, fxy, n, x, y, oob, ci, cj = _prologue(pack, P, grid, lons, lats, tile_n)
    tn = tile_n
    n_tot = stT.shape[1]
    dy_t, dx_t, code_t = _sel_tables(offs, P, R, tn)
    rows = 1 + (3 if emit_d2 else 2) * k + (resolve_thresh is not None)

    out = pl.pallas_call(
        partial(_sel_kernel, k=k, emit_d2=emit_d2, half=half, resolve_thresh=resolve_thresh),
        out_shape=jax.ShapeDtypeStruct((rows, n_tot), jnp.float32),
        grid=(n_tot // tn,),
        in_specs=[
            pl.BlockSpec((P, tn), lambda i: (0, i)),
            pl.BlockSpec((2, tn), lambda i: (0, i)),
            pl.BlockSpec((P, tn), lambda i: (0, 0)),
            pl.BlockSpec((P, tn), lambda i: (0, 0)),
            pl.BlockSpec((P, tn), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, tn), lambda i: (0, i)),
    )(stT, fxy, jnp.asarray(dy_t), jnp.asarray(dx_t), jnp.asarray(code_t))
    return out, n, x, y, oob, ci, cj


def _kriging_rows_epilogue(grid, lons, lats, out, oob, ci, cj, R, *, vparams, model, half=0.5):
    """Row-layout kriging solve: out rows [cnt, 4*val, 4*code] feed
    krige_solve_cols with zero relayout."""
    from ..config import KrigingConfig
    from ..ops.scattered import krige_solve_cols

    B = 2 * R + 2
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
        sdy = jnp.floor(code / B) - R
        sdx = code - (sdy + R) * B - R
        cx_c.append(grid.min_lon + (ci_f + sdx + half) * lon_step)
        cy_c.append(grid.min_lat + (cj_f + sdy + half) * lat_step)
    pred, singular = krige_solve_cols(
        jnp.asarray(lons, dt), jnp.asarray(lats, dt), vals_c, cx_c, cy_c,
        KrigingConfig(), vparams=vparams, model=model,
    )
    # invalid slots carry val=0 (all-zero one-hot), so sum/count == the
    # masked mean the packed path uses for its <4-neighbor fallback
    fb = (vals_c[0] + vals_c[1] + vals_c[2] + vals_c[3]) / jnp.maximum(found, 1.0)
    res = jnp.where(singular | (found < 3.5), fb, pred)
    return jnp.where(oob, jnp.nan, res)


def _idw_launch(pack, P, offs, grid, lons, lats, *, k, tile_n, half=0.5, resolve_thresh=None):
    import jax.experimental.pallas as pl

    from ..config import IDWConfig

    if not 1 <= k <= P:
        raise ValueError(f"k must be in 1..{P}")
    eps = IDWConfig(k=k).eps
    stT, fxy, n, x, y, oob, ci, cj = _prologue(pack, P, grid, lons, lats, tile_n)
    tn = tile_n
    n_tot = stT.shape[1]
    dy_t, dx_t, _ = _sel_tables(offs, P, 2, tn)

    rows = 2 + (resolve_thresh is not None)
    out = pl.pallas_call(
        partial(_idw_kernel, k=k, inv_eps=np.float32(eps), half=half, resolve_thresh=resolve_thresh),
        out_shape=jax.ShapeDtypeStruct((rows, n_tot), jnp.float32),
        grid=(n_tot // tn,),
        in_specs=[
            pl.BlockSpec((P, tn), lambda i: (0, i)),
            pl.BlockSpec((2, tn), lambda i: (0, i)),
            pl.BlockSpec((P, tn), lambda i: (0, 0)),
            pl.BlockSpec((P, tn), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, tn), lambda i: (0, i)),
    )(stT, fxy, jnp.asarray(dy_t), jnp.asarray(dx_t))
    num, den = out[0, :n], out[1, :n]
    res = jnp.where(den > 0, num / jnp.maximum(den, eps), jnp.nan)
    res = jnp.where(oob, jnp.nan, res.astype(grid.dtype))
    if resolve_thresh is None:
        return res
    # NOTE no oob term: _resolved_mask_jit's select also fetches the
    # clipped center cell for out-of-bounds queries, so they resolve
    # whenever k in-window candidates exist — and both tiers emit NaN for
    # them anyway.  Matching exactly keeps bad_count (and therefore the
    # escalation chunking) identical to the XLA path.
    resolved = out[2, :n] > 0.5
    return res, resolved, jnp.sum(~resolved)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("tile_n",))
def valid_select_t(pack16, grid: RegularGrid, lons, lats, *, tile_n: int = 2048):
    """Transposed fused valid-grid top-4: same select dict as
    ops.packs.select_from_stencil over VALID16_OFFSETS."""
    R, B = 2, 6
    out, n, x, y, oob, ci, cj = _select_rows(
        pack16, 16, VALID16_OFFSETS, R, grid, lons, lats, tile_n, emit_d2=True
    )
    out = out[:, :n]
    dt = grid.dtype
    found = out[0].astype(jnp.int32)
    vals = out[1:5].T.astype(dt)  # (N, 4)
    d2 = out[5:9].T.astype(dt)
    code = jnp.maximum(out[9:13].T, 0.0)
    slot_ok = jax.lax.broadcasted_iota(jnp.int32, (n, 4), 1) < found[:, None]
    sdy = jnp.floor(code / B) - R
    sdx = code - (sdy + R) * B - R
    return {
        "x": x, "y": y, "oob": oob, "ci": ci, "cj": cj,
        "val": vals, "d2": d2, "slot_ok": slot_ok, "found": found,
        "dy": sdy.astype(dt), "dx": sdx.astype(dt),
    }


@partial(jax.jit, static_argnames=("tile_n", "model"))
def pallas_kriging_valid(pack16, grid: RegularGrid, lons, lats, *, vparams=None, tile_n: int = 2048, model: str = "exponential"):
    """Transposed-select drop-in for ops.packs.packed_kriging_valid (FULLY-
    VALID grids, reference convention; containment proof in that function's
    docstring).  120.4 M pts/s at 5M on chip vs 107 XLA, bit-exact."""
    out, n, x, y, oob, ci, cj = _select_rows(
        pack16, 16, VALID16_OFFSETS, 2, grid, lons, lats, tile_n, emit_d2=False
    )
    return _kriging_rows_epilogue(
        grid, lons, lats, out[:, :n], oob, ci, cj, 2, vparams=vparams, model=model
    )


@partial(jax.jit, static_argnames=("window_radius", "tile_n", "model", "convention", "resolve_thresh"))
def pallas_packed_kriging_t(pack, grid: RegularGrid, lons, lats, *, window_radius: int = 2, vparams=None, tile_n: int = 2048, model: str = "exponential", convention: str = "reference", resolve_thresh=None):
    """Transposed-select drop-in for ops.packs.packed_kriging: top-4 over
    the FULL radius-R window pack (P=32 for R=2), so it is correct on
    masked grids and at grid edges — no validity assumption.  The fetch is
    row-count-bound (same cost as the 16-lane pack); only the kernel's
    sublane passes widen."""
    half = 0.5 if convention == "reference" else 0.0
    offs = window_offsets(window_radius)
    P = 1
    while P < len(offs):
        P *= 2
    out, n, x, y, oob, ci, cj = _select_rows(
        pack, P, offs, window_radius, grid, lons, lats, tile_n, emit_d2=False,
        half=half, resolve_thresh=resolve_thresh,
    )
    res = _kriging_rows_epilogue(
        grid, lons, lats, out[:, :n], oob, ci, cj, window_radius,
        vparams=vparams, model=model, half=half,
    )
    if resolve_thresh is None:
        return res
    # fused two-tier resolution row (see _idw_launch for the oob note)
    resolved = out[9, :n] > 0.5
    return res, resolved, jnp.sum(~resolved)


@partial(jax.jit, static_argnames=("k", "window_radius", "tile_n", "convention", "resolve_thresh"))
def pallas_packed_idw_t(pack, grid: RegularGrid, lons, lats, *, k: int = 8, window_radius: int = 2, tile_n: int = 2048, convention: str = "reference", resolve_thresh=None):
    """Transposed in-kernel IDW (power=2) drop-in for ops.packs.packed_idw:
    selection AND the weighted reduction run in one (P, tn) kernel over the
    full radius-R window pack; XLA sees only (2, N) [num, den] rows.
    Correct on masked grids and at edges (full window, no containment
    assumption).

    power is fixed at 2 (w = 1/(d2+eps), the IDWConfig default): Mosaic
    has no powf; other exponents stay on the XLA packed path."""
    half = 0.5 if convention == "reference" else 0.0
    offs = window_offsets(window_radius)
    P = 1
    while P < len(offs):
        P *= 2
    return _idw_launch(
        pack, P, offs, grid, lons, lats, k=k, tile_n=tile_n, half=half,
        resolve_thresh=resolve_thresh,
    )
