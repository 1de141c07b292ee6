"""Exact-reference neighbor selection on the device path (``--selection exact``).

The v2 ops (ops/dense.py, ops/window.py) implement true-k-nearest selection;
the reference's observable selection differs in two ways that the published
Grid B error tables depend on (docs/SEMANTICS.md):

1. **Ring-segment cutoff** (GridH.cpp:49-116): candidates are collected in
   ring order and collection stops at the end of the first *segment* (a ring's
   top/bottom edge pass or left/right edge pass) where >= 4 valid candidates
   are held.  Under the one-sided +0.5 metric, later rings contain closer
   cells than earlier ones, so the cutoff changes which neighbors exist.
2. **Selection-sort with swaps** (GridH.cpp:123-140): 4 passes of
   first-minimum selection over f64 distances, *swapping* the displaced
   element into the minimum's slot.  Swaps reorder equal-distance candidates,
   changing which tied candidate later passes pick.

Both are reproduced here exactly, for cell-aligned queries (the Grid B
workload: test_gebco.cpp:152-160 queries the masked cells themselves).

**Why no f64 ordering arithmetic is needed.**  The harness computes
``lon = min_lon + col*lon_step`` and the engine computes
``x = (lon - min_lon)/lon_step`` — an f64 round-trip whose residue
``eps = x - anchor`` is tiny (|eps| <~ 2.5e-12) but *breaks distance ties*,
and the reference's tie resolution follows it (~48% of Mid-Atlantic cells
select differently with eps forced to 0).  For a candidate offset (dx, dy)
from an integer anchor, di = (dx + ax + 0.5) - eps_x exactly (the subtraction
is exact in f64: the result needs < 53 bits), so the exact squared distance is

    d2 = d2_static - u*T + (eps_x^2 + eps_y^2),
    d2_static = (dx+ax+0.5)^2 + (dy+ay+0.5)^2,
    T = eps_x*(2(dx+ax)+1) + eps_y*(2(dy+ay)+1)

where the eps^2 term is lane-independent.  Hence within a static-d2 tie group
the exact ordering is exactly *descending T*; across distinct static d2 the
gap (>= 0.25) dwarfs every eps and rounding term; and the reference's f64
rounding of sqrt(di*di+dj*dj) can neither flip nor merge T-distinct lanes
(minimum nonzero exact gap ~2^-41 at tile scale vs combined rounding
< 0.9 * 2^-41).  An exact T tie is an exact distance tie, which the reference
resolves by first-minimum = lowest *compacted position* (as mutated by the
previous swaps).  The device keys are therefore

    (d2_static ascending, T descending, position ascending)

— a static f32 table, an exactly-representable f32 scalar per lane (eps
scaled by 2^41 keeps every product/sum under 24 significand bits), and an
int32 position plane mutated by the 4 swap passes.  Empirically this
reproduces the golden engine's *ordered* selection on 100% of the
Mid-Atlantic, East-Pacific and Mariana held-out cells (62,340 queries;
pinned by tests/test_exact.py).

The 5x5 kriging solve is the one place where *values* (not orderings) need
f64: an f32 Gauss-Jordan shifts regional MAE by ~2e-3 m, above the 5e-5
published-table tolerance.  Run exact mode under ``jax.config.jax_enable_x64``
(the CLI's ``--selection exact`` does this) for full table parity; without
x64 the selection is still exact but metrics match only to ~1e-2.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import KrigingConfig
from ..golden.engine import ring_offsets
from ..grid import RegularGrid
from .scattered import krige_solve

# eps scale: a power of two, so scaling is exact; chosen so |eps|*SCALE stays
# in a few-bit f32 range (|eps| <~ 2.5e-12 => scaled <~ 5.5)
EPS_SCALE = float(2**41)
_BIG = np.int32(1 << 20)


@lru_cache(maxsize=8)
def exact_tables(max_radius: int = 10):
    """Static per-lane tables in exact reference collection order.

    Returns numpy arrays (M = (2R+1)^2 lanes):
      dx, dy       (M,)  int32 offsets (collection order, ring_offsets);
      prev_end     (M,)  int32 lane index of the last lane of the *previous*
                         segment (-1 for segment 0) — the cutoff test
                         ``count >= 4`` happens at segment ends (GridH.cpp:82,115);
      d2           (4,M) f32 static squared distance per anchor variant;
      cfx, cfy     (4,M) f32 first-order tie coefficients per variant.

    Anchor variants encode the f64 floor-anchoring of the query: variant
    v = 2*ex_int + ey_int where ex_int = round(x - anchor_x) in {0, 1}
    (1 when eps < 0 pushed floor(x) one cell left/down).
    """
    offs, seg_id = ring_offsets(max_radius)
    dx = offs[:, 0].astype(np.int64)
    dy = offs[:, 1].astype(np.int64)
    m = len(offs)
    nseg = int(seg_id[-1]) + 1
    seg_end = np.searchsorted(seg_id, np.arange(nseg), side="right") - 1
    prev_end = np.where(seg_id > 0, seg_end[np.maximum(seg_id - 1, 0)], -1)

    d2 = np.empty((4, m), np.float32)
    cfx = np.empty((4, m), np.float32)
    cfy = np.empty((4, m), np.float32)
    for v in range(4):
        ax = -(v >> 1)  # 0 or -1
        ay = -(v & 1)
        ddx = dx + ax + 0.5
        ddy = dy + ay + 0.5
        d2[v] = (ddx * ddx + ddy * ddy).astype(np.float32)  # quarter-integers: f32-exact
        cfx[v] = (2 * (dx + ax) + 1).astype(np.float32)
        cfy[v] = (2 * (dy + ay) + 1).astype(np.float32)
    return dict(
        dx=dx.astype(np.int32),
        dy=dy.astype(np.int32),
        prev_end=prev_end.astype(np.int32),
        d2=d2,
        cfx=cfx,
        cfy=cfy,
    )


@dataclasses.dataclass(frozen=True)
class ExactQueries:
    """Host-prepared exact cell-aligned query features (all numpy)."""

    ci: np.ndarray  # (N,) int32 anchor column
    cj: np.ndarray  # (N,) int32 anchor row
    variant: np.ndarray  # (N,) int32 in 0..3
    ex_key: np.ndarray  # (N,) f32 eps_x * EPS_SCALE (exact)
    ey_key: np.ndarray  # (N,) f32
    qlon: np.ndarray  # (N,) f64 raw query lon (reference round-trip)
    qlat: np.ndarray  # (N,) f64
    x: np.ndarray  # (N,) f64 grid coords
    y: np.ndarray  # (N,) f64
    oob: np.ndarray  # (N,) bool


def prepare_exact_queries(grid: RegularGrid, rows, cols, *, anchor: str = "round") -> ExactQueries:
    """Reproduce the reference harness's index->geo->grid-coord round-trip in
    f64 (gridIndexToGeo, test_gebco.cpp:72-81 + GridH.cpp:166-167) and split
    each coordinate into (integer anchor, exact scaled residue).

    anchor='round' is the kriging center (GridH.cpp:333-336); anchor='floor'
    is the bilinear/bicubic cell anchor (GridH.cpp:170-173, 231-234).
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    H, W = grid.shape
    lon_step = (grid.max_lon - grid.min_lon) / (W - 1)
    lat_step = (grid.max_lat - grid.min_lat) / (H - 1)
    qlon = grid.min_lon + cols * lon_step
    qlat = grid.min_lat + rows * lat_step
    oob = (qlon < grid.min_lon) | (qlon > grid.max_lon) | (qlat < grid.min_lat) | (qlat > grid.max_lat)
    x = np.where(oob, 0.0, (qlon - grid.min_lon) / lon_step)
    y = np.where(oob, 0.0, (qlat - grid.min_lat) / lat_step)
    if anchor == "round":
        ci = np.clip(np.floor(x + 0.5).astype(np.int64), 0, W - 1)
        cj = np.clip(np.floor(y + 0.5).astype(np.int64), 0, H - 1)
    elif anchor == "floor":
        ci = np.floor(x).astype(np.int64)
        cj = np.floor(y).astype(np.int64)
    else:
        raise ValueError(anchor)
    exi = np.rint(x - ci).astype(np.int64)  # 0 or 1
    eyi = np.rint(y - cj).astype(np.int64)
    exf = (x - ci) - exi  # exact in f64 (|.| ~ 1e-12)
    eyf = (y - cj) - eyi
    ex_key = exf * EPS_SCALE
    ey_key = eyf * EPS_SCALE
    if not (np.float64(np.float32(ex_key)) == ex_key).all() or not (
        np.float64(np.float32(ey_key)) == ey_key
    ).all():
        # never observed on the GEBCO tiles (eps has <= ~14 significant
        # bits); if a pathological extent ever produces a fatter residue the
        # f32 key would silently mis-order ties, so refuse loudly
        raise ValueError("coordinate residue not exactly representable in f32 keys")
    return ExactQueries(
        ci=ci.astype(np.int32),
        cj=cj.astype(np.int32),
        variant=(2 * exi + eyi).astype(np.int32),
        ex_key=ex_key.astype(np.float32),
        ey_key=ey_key.astype(np.float32),
        qlon=qlon,
        qlat=qlat,
        x=x,
        y=y,
        oob=oob,
    )


# ---------------------------------------------------------------------------
# device selection kernel
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_radius",))
def _select_chunk(elev, valid, ci, cj, variant, ex_key, ey_key, *, max_radius):
    """Exact selection for one fixed-size chunk of queries.

    Returns (found (N,), sel_val (N,4), sel_gi (N,4) int32, sel_gj (N,4),
    fb_sum (N,)) where sel_* are in reference selection order and fb_sum is
    the sum of ALL eligible candidate values (for the found<4 fallback).
    """
    tb = exact_tables(max_radius)
    tdx = jnp.asarray(tb["dx"])  # (M,)
    tdy = jnp.asarray(tb["dy"])
    prev_end = jnp.asarray(tb["prev_end"])
    d2_tab = jnp.asarray(tb["d2"])  # (4, M)
    cfx_tab = jnp.asarray(tb["cfx"])
    cfy_tab = jnp.asarray(tb["cfy"])

    H, W = valid.shape
    gi = ci[:, None] + tdx[None, :]  # (N, M) int32
    gj = cj[:, None] + tdy[None, :]
    inb = (gi >= 0) & (gi < W) & (gj >= 0) & (gj < H)
    flat = jnp.clip(gj, 0, H - 1) * W + jnp.clip(gi, 0, W - 1)
    val = jnp.take(elev.reshape(-1), flat)
    ok = jnp.take(valid.reshape(-1), flat) > 0.5
    cand = inb & ok

    # segment cutoff: lane eligible iff its segment started before 4 were held
    cum = jnp.cumsum(cand.astype(jnp.int32), axis=1)
    cum_prev = jnp.where(
        prev_end[None, :] < 0, 0, cum[:, jnp.maximum(prev_end, 0)]
    )
    eligible = cand & (cum_prev < 4)
    found = eligible.sum(axis=1)

    # keys
    d2 = d2_tab[variant]  # (N, M) static squared distance
    tkey = ex_key[:, None] * cfx_tab[variant] + ey_key[:, None] * cfy_tab[variant]
    pos = jnp.where(eligible, cum - 1, _BIG)  # compacted collection position

    sel_val, sel_gi, sel_gj = [], [], []
    inf = jnp.float32(jnp.inf)
    for m in range(4):
        active = pos >= m  # ineligible lanes sit at _BIG and never activate...
        # (note: ineligible lanes ARE >= m; exclude via eligibility)
        active = active & eligible
        key1 = jnp.where(active, d2, inf)
        m1 = key1.min(axis=1, keepdims=True)
        c1 = active & (key1 == m1)
        t2 = jnp.where(c1, tkey, -inf)
        m2 = t2.max(axis=1, keepdims=True)
        c2 = c1 & (t2 == m2)
        p3 = jnp.where(c2, pos, _BIG)
        kpos = p3.min(axis=1, keepdims=True)  # position of the pass-m pick
        sel = eligible & (pos == kpos) & (kpos < _BIG)
        sel_val.append(jnp.where(sel, val, 0).sum(axis=1))
        sel_gi.append(jnp.where(sel, gi, 0).sum(axis=1))
        sel_gj.append(jnp.where(sel, gj, 0).sum(axis=1))
        # swap: the lane at position m moves to kpos; the picked lane takes m
        mlane = eligible & (pos == m)
        pos = jnp.where(mlane, kpos, jnp.where(sel, m, pos))

    stack = lambda xs: jnp.stack(xs, axis=1)
    return found, stack(sel_val), stack(sel_gi), stack(sel_gj)


def _run_chunked(fn, n, chunk, *arrays):
    """Pad to chunk multiples and loop fixed-shape jitted calls."""
    if n == 0:
        return None
    outs = []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        pad = chunk - (e - s)
        args = [np.pad(a[s:e], [(0, pad)] + [(0, 0)] * (a.ndim - 1), mode="edge") for a in arrays]
        outs.append(fn(*[jnp.asarray(a) for a in args]))
    return [np.concatenate([np.asarray(o[i]) for o in outs])[:n] for i in range(len(outs[0]))]


def exact_select_at_cells(grid: RegularGrid, rows, cols, *, max_radius: int = 10, chunk: int = 16384, anchor: str = "round"):
    """Device exact-reference selection at cell-aligned queries.

    Returns numpy (found (N,), sel_val (N,4), sel_gi (N,4), sel_gj (N,4),
    ExactQueries).  When found < 4 the `found` passes selected *all* eligible
    candidates (slots >= found are zero), so the reference's partial-fallback
    mean is sel_val.sum() / found.
    """
    q = prepare_exact_queries(grid, rows, cols, anchor=anchor)
    n = len(q.ci)
    sel = partial(_select_chunk, grid.elev, grid.valid, max_radius=max_radius)
    out = _run_chunked(sel, n, min(chunk, max(n, 1)), q.ci, q.cj, q.variant, q.ex_key, q.ey_key)
    found, sel_val, sel_gi, sel_gj = out
    return found, sel_val, sel_gi, sel_gj, q


# ---------------------------------------------------------------------------
# exact method ops (Grid B)
# ---------------------------------------------------------------------------

def _fallback_mean_np(found, sel_val):
    """Reference fallback mean: found>=4 -> mean of the 4 selected
    (GridH.cpp:10-18); 0<found<4 -> mean of all found (GridH.cpp:291-298);
    found==0 -> NaN.  Slots >= found are zero, so one sum serves all cases."""
    k = np.minimum(found, 4)
    s = sel_val.astype(np.float64).sum(axis=1)
    with np.errstate(invalid="ignore"):
        return np.where(k > 0, s / np.maximum(k, 1), np.nan)


@jax.jit
def _krige_chunk(qlon, qlat, vals, cx, cy):
    pred, singular = krige_solve(qlon, qlat, vals, cx, cy, KrigingConfig())
    return pred, singular


def exact_kriging_at_cells(grid: RegularGrid, rows, cols, *, max_radius: int = 10, chunk: int = 16384):
    """Ordinary kriging with exact reference selection (GridH.cpp:326-420).

    Selection runs in exact f32/int32 arithmetic (module docstring); the 5x6
    Gauss-Jordan runs in the caller's active precision — enable x64 for
    published-table parity.  Returns (N,) numpy f64 predictions.
    """
    found, sel_val, sel_gi, sel_gj, q = exact_select_at_cells(
        grid, rows, cols, max_radius=max_radius, chunk=chunk, anchor="round"
    )
    n = len(found)
    out = np.full(n, np.nan)
    few = (found < 4) & ~q.oob
    out[few] = _fallback_mean_np(found[few], sel_val[few])

    okm = (found >= 4) & ~q.oob
    if okm.any():
        lon_step = (grid.max_lon - grid.min_lon) / (grid.num_lon - 1)
        lat_step = (grid.max_lat - grid.min_lat) / (grid.num_lat - 1)
        # neighbors at cell centers, query at raw coords (GridH.cpp:361-396)
        cx = grid.min_lon + (sel_gi[okm].astype(np.float64) + 0.5) * lon_step
        cy = grid.min_lat + (sel_gj[okm].astype(np.float64) + 0.5) * lat_step
        vals = sel_val[okm].astype(np.float64)
        idx = np.nonzero(okm)[0]
        res = _run_chunked(
            lambda a, b, c, d, e: _krige_chunk(a, b, c, d, e),
            len(idx), min(chunk, len(idx)),
            q.qlon[okm], q.qlat[okm], vals, cx, cy,
        )
        pred, singular = res
        fb4 = vals.mean(axis=1)
        out[idx] = np.where(singular.astype(bool), fb4, pred)
    return out


def exact_cubic_at_cells(grid: RegularGrid, rows, cols, *, max_radius: int = 10, chunk: int = 16384):
    """Bicubic with exact reference fallback (GridH.cpp:223-319).

    For Grid B queries (the masked cells themselves) the floor-anchored 4x4
    Catmull-Rom patch spans columns [xi-1, xi+2] with xi = floor(x) in
    {c-1, c}, so it always contains the (invalid) query cell — the reference
    therefore *always* takes the ring-fallback path: the mean of the 4
    exact-selected neighbors around the floor anchor.  Cells whose patch is
    fully valid (never the case for masked-cell queries) get the smooth
    Catmull-Rom value instead.
    """
    found, sel_val, sel_gi, sel_gj, q = exact_select_at_cells(
        grid, rows, cols, max_radius=max_radius, chunk=chunk, anchor="floor"
    )
    n = len(found)
    out = np.full(n, np.nan)
    live = ~q.oob
    fb = _fallback_mean_np(found, sel_val)
    out[live] = fb[live]

    # smooth path for queries whose 4x4 patch is fully valid
    valid_np = np.asarray(grid.valid) > 0.5
    elev_np = np.asarray(grid.elev, np.float64)
    H, W = grid.shape
    xi = q.ci.astype(np.int64)
    yi = q.cj.astype(np.int64)
    jj = np.clip(yi[:, None] + np.arange(-1, 3)[None, :], 0, H - 1)
    ii = np.clip(xi[:, None] + np.arange(-1, 3)[None, :], 0, W - 1)
    patch_ok = valid_np[jj[:, :, None], ii[:, None, :]].all(axis=(1, 2)) & live
    if patch_ok.any():
        from ..golden.engine import _catmull_rom

        tx = (q.x - xi)[patch_ok]
        ty = (q.y - yi)[patch_ok]
        patch = elev_np[jj[patch_ok][:, :, None], ii[patch_ok][:, None, :]]
        col = _catmull_rom(
            patch[:, :, 0], patch[:, :, 1], patch[:, :, 2], patch[:, :, 3], tx[:, None]
        )
        out[patch_ok] = _catmull_rom(col[:, 0], col[:, 1], col[:, 2], col[:, 3], ty)
    return out


# ---------------------------------------------------------------------------
# exact selection for arbitrary scattered queries (Grid A)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_radius",))
def _select_chunk_scattered(elev, valid, ci, cj, x, y, *, max_radius):
    """Exact reference ring selection for arbitrary (non-cell-aligned)
    queries — the Grid A regime (test_interpolation.cpp:120-160 generates
    continuous random coordinates).

    Unlike the cell-aligned path (module docstring), no T-key decomposition
    exists for arbitrary fractional positions; the keys are the reference's
    own f64 ``sqrt(di*di+dj*dj)`` values (GridH.cpp:95-99), so this kernel
    must run under ``jax_enable_x64``.  Equal keys — exact geometric ties, or
    distinct d2 merged by f64 sqrt rounding, both of which the reference's
    ``dist < minDist`` scan resolves by compacted position — break by the
    swap-mutated position plane, exactly like GridH.cpp:123-140.
    """
    tb = exact_tables(max_radius)
    tdx = jnp.asarray(tb["dx"])
    tdy = jnp.asarray(tb["dy"])
    prev_end = jnp.asarray(tb["prev_end"])

    H, W = valid.shape
    gi = ci[:, None] + tdx[None, :]  # (N, M)
    gj = cj[:, None] + tdy[None, :]
    inb = (gi >= 0) & (gi < W) & (gj >= 0) & (gj < H)
    flat = jnp.clip(gj, 0, H - 1) * W + jnp.clip(gi, 0, W - 1)
    val = jnp.take(elev.reshape(-1), flat)
    ok = jnp.take(valid.reshape(-1), flat) > 0.5
    cand = inb & ok

    cum = jnp.cumsum(cand.astype(jnp.int32), axis=1)
    cum_prev = jnp.where(prev_end[None, :] < 0, 0, cum[:, jnp.maximum(prev_end, 0)])
    eligible = cand & (cum_prev < 4)
    found = eligible.sum(axis=1)

    dt = x.dtype
    di = (gi.astype(dt) + dt.type(0.5)) - x[:, None]
    dj = (gj.astype(dt) + dt.type(0.5)) - y[:, None]
    dist = jnp.sqrt(di * di + dj * dj)
    pos = jnp.where(eligible, cum - 1, _BIG)

    sel_val, sel_gi, sel_gj = [], [], []
    inf = jnp.asarray(jnp.inf, dt)
    for m in range(4):
        active = eligible & (pos >= m)
        key = jnp.where(active, dist, inf)
        m1 = key.min(axis=1, keepdims=True)
        c1 = active & (key == m1)
        p3 = jnp.where(c1, pos, _BIG)
        kpos = p3.min(axis=1, keepdims=True)
        sel = eligible & (pos == kpos) & (kpos < _BIG)
        sel_val.append(jnp.where(sel, val, 0).sum(axis=1))
        sel_gi.append(jnp.where(sel, gi, 0).sum(axis=1))
        sel_gj.append(jnp.where(sel, gj, 0).sum(axis=1))
        mlane = eligible & (pos == m)
        pos = jnp.where(mlane, kpos, jnp.where(sel, m, pos))

    stack = lambda xs: jnp.stack(xs, axis=1)
    return found, stack(sel_val), stack(sel_gi), stack(sel_gj)


def _prepare_scattered(grid: RegularGrid, lons, lats, anchor: str):
    """f64 normalization for raw scattered coordinates (golden.engine
    _normalize semantics: oob outside the extent, anchors clamped).

    Deliberately parallel to prepare_exact_queries (which starts from
    integer indices and additionally splits tie-breaking residues): any
    change to the oob/clamp convention must be applied to BOTH."""
    lons = np.asarray(lons, np.float64).ravel()
    lats = np.asarray(lats, np.float64).ravel()
    H, W = grid.shape
    lon_step = (grid.max_lon - grid.min_lon) / (W - 1)
    lat_step = (grid.max_lat - grid.min_lat) / (H - 1)
    oob = (
        (lons < grid.min_lon) | (lons > grid.max_lon)
        | (lats < grid.min_lat) | (lats > grid.max_lat)
    )
    x = np.where(oob, 0.0, (lons - grid.min_lon) / lon_step)
    y = np.where(oob, 0.0, (lats - grid.min_lat) / lat_step)
    if anchor == "round":
        ci = np.clip(np.floor(x + 0.5).astype(np.int64), 0, W - 1)
        cj = np.clip(np.floor(y + 0.5).astype(np.int64), 0, H - 1)
    elif anchor == "floor":
        ci = np.floor(x).astype(np.int64)
        cj = np.floor(y).astype(np.int64)
    else:
        raise ValueError(anchor)
    return lons, lats, x, y, ci.astype(np.int32), cj.astype(np.int32), oob


def _require_x64():
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "exact scattered selection orders true f64 distances; enable "
            "jax.config.update('jax_enable_x64', True) first (the CLIs' "
            "--selection exact does this)"
        )


def exact_kriging_scattered(grid: RegularGrid, lons, lats, *, max_radius: int = 10, chunk: int = 16384):
    """Ordinary kriging at arbitrary coordinates with exact reference
    selection (GridH.cpp:326-420 for continuous queries — the Grid A
    workload).  Requires x64; returns (N,) numpy f64."""
    _require_x64()
    lons, lats, x, y, ci, cj, oob = _prepare_scattered(grid, lons, lats, "round")
    n = len(x)
    if n == 0:
        return np.zeros((0,), np.float64)
    sel = partial(_select_chunk_scattered, grid.elev, grid.valid, max_radius=max_radius)
    found, sel_val, sel_gi, sel_gj = _run_chunked(
        sel, n, min(chunk, max(n, 1)), ci, cj, x, y
    )
    out = np.full(n, np.nan)
    few = (found < 4) & ~oob
    out[few] = _fallback_mean_np(found[few], sel_val[few])

    okm = (found >= 4) & ~oob
    if okm.any():
        lon_step = (grid.max_lon - grid.min_lon) / (grid.num_lon - 1)
        lat_step = (grid.max_lat - grid.min_lat) / (grid.num_lat - 1)
        cx = grid.min_lon + (sel_gi[okm].astype(np.float64) + 0.5) * lon_step
        cy = grid.min_lat + (sel_gj[okm].astype(np.float64) + 0.5) * lat_step
        vals = sel_val[okm].astype(np.float64)
        idx = np.nonzero(okm)[0]
        pred, singular = _run_chunked(
            lambda a, b, c, d, e: _krige_chunk(a, b, c, d, e),
            len(idx), min(chunk, len(idx)),
            lons[okm], lats[okm], vals, cx, cy,
        )
        fb4 = vals.mean(axis=1)
        out[idx] = np.where(singular.astype(bool), fb4, pred)
    return out


@jax.jit
def _cubic_smooth_chunk(elev, valid, xi, yi, x, y):
    """f64 Catmull-Rom over the clamped 4x4 patch + patch validity
    (GridH.cpp:223-319 smooth path)."""
    from .scattered import _catmull_rom

    H, W = valid.shape
    rel = jnp.arange(-1, 3, dtype=jnp.int32)
    jj = jnp.clip(yi[:, None] + rel[None, :], 0, H - 1)
    ii = jnp.clip(xi[:, None] + rel[None, :], 0, W - 1)
    flat = jj[:, :, None] * W + ii[:, None, :]
    patch = jnp.take(elev.reshape(-1), flat)  # (N, 4, 4)
    pv = jnp.take(valid.reshape(-1), flat) > 0.5
    all_ok = pv.all(axis=(1, 2))
    tx = x - xi.astype(x.dtype)
    ty = y - yi.astype(y.dtype)
    col = _catmull_rom(
        patch[:, :, 0], patch[:, :, 1], patch[:, :, 2], patch[:, :, 3], tx[:, None]
    )
    smooth = _catmull_rom(col[:, 0], col[:, 1], col[:, 2], col[:, 3], ty)
    return smooth, all_ok


def exact_cubic_scattered(grid: RegularGrid, lons, lats, *, max_radius: int = 10, chunk: int = 16384):
    """Bicubic at arbitrary coordinates: f64 Catmull-Rom when the 4x4 patch
    is fully valid, else the exact ring-fallback mean at the floor anchor
    (GridH.cpp:223-319).  Requires x64."""
    _require_x64()
    lons, lats, x, y, ci, cj, oob = _prepare_scattered(grid, lons, lats, "floor")
    n = len(x)
    if n == 0:
        return np.zeros((0,), np.float64)
    smooth, all_ok = _run_chunked(
        partial(_cubic_smooth_chunk, grid.elev, grid.valid),
        n, min(chunk, max(n, 1)), ci, cj, x, y,
    )
    out = np.asarray(smooth, np.float64).copy()
    need = ~all_ok.astype(bool) & ~oob
    if need.any():
        sel = partial(_select_chunk_scattered, grid.elev, grid.valid, max_radius=max_radius)
        found, sel_val, _, _ = _run_chunked(
            sel, int(need.sum()), min(chunk, max(int(need.sum()), 1)),
            ci[need], cj[need], x[need], y[need],
        )
        out[need] = _fallback_mean_np(found, sel_val)
    return np.where(oob, np.nan, out)


@jax.jit
def _bilinear_chunk(elev, valid, x0, y0, x, y):
    """f64 bilinear with the reference's clamped +1 corners and
    valid-corner-mean fallback (GridH.cpp:160-210)."""
    H, W = valid.shape
    x0c = jnp.clip(x0, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    x1 = jnp.minimum(x0c + 1, W - 1)
    y1 = jnp.minimum(y0c + 1, H - 1)
    ev = elev.reshape(-1)
    vv = valid.reshape(-1)
    idx = [y0c * W + x0c, y0c * W + x1, y1 * W + x0c, y1 * W + x1]
    z = [jnp.take(ev, i) for i in idx]
    m = [jnp.take(vv, i) > 0.5 for i in idx]
    cnt = sum(mm.astype(jnp.int32) for mm in m)
    s = sum(jnp.where(mm, zz, 0.0) for mm, zz in zip(m, z))
    fb = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), jnp.nan)
    wx = x - x0.astype(x.dtype)
    wy = y - y0.astype(y.dtype)
    z0 = (1 - wx) * z[0] + wx * z[1]
    z1 = (1 - wx) * z[2] + wx * z[3]
    smooth = (1 - wy) * z0 + wy * z1
    return jnp.where(cnt >= 4, smooth, fb)


def exact_bilinear_scattered(grid: RegularGrid, lons, lats, *, chunk: int = 16384):
    """Bilinear at arbitrary coordinates in f64 (GridH.cpp:160-210).
    Requires x64."""
    _require_x64()
    lons, lats, x, y, ci, cj, oob = _prepare_scattered(grid, lons, lats, "floor")
    n = len(x)
    if n == 0:
        return np.zeros((0,), np.float64)
    (out,) = _run_chunked(
        lambda *a: (_bilinear_chunk(grid.elev, grid.valid, *a),),
        n, min(chunk, max(n, 1)), ci, cj, x, y,
    )
    return np.where(oob, np.nan, np.asarray(out, np.float64))


def exact_bilinear_at_cells(grid: RegularGrid, rows, cols):
    """Bilinear with the reference's floor anchoring (GridH.cpp:160-210).

    The f64 eps sign decides the anchor cell: x0 = floor(c + eps) is c-1 when
    eps < 0, which changes *which four corners* feed the valid-corner-mean
    fallback.  Values are eps-insensitive (the lerp weight rounds to 0/1 at
    ~1e-12), so only the anchor needs the f64 round-trip.
    """
    q = prepare_exact_queries(grid, rows, cols, anchor="floor")
    H, W = grid.shape
    x0 = q.ci.astype(np.int64)
    y0 = q.cj.astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    wx = q.x - x0  # ~0 or ~1 (within 1e-12)
    wy = q.y - y0
    elev = np.asarray(grid.elev, np.float64)
    valid = np.asarray(grid.valid) > 0.5
    x0c = np.clip(x0, 0, W - 1)
    y0c = np.clip(y0, 0, H - 1)
    z = np.stack([elev[y0c, x0c], elev[y0c, x1], elev[y1, x0c], elev[y1, x1]])
    m = np.stack([valid[y0c, x0c], valid[y0c, x1], valid[y1, x0c], valid[y1, x1]])
    cnt = m.sum(axis=0)
    with np.errstate(invalid="ignore"):
        fb = np.where(cnt > 0, np.where(m, z, 0.0).sum(axis=0) / np.maximum(cnt, 1), np.nan)
    z0 = (1 - wx) * z[0] + wx * z[1]
    z1 = (1 - wx) * z[2] + wx * z[3]
    smooth = (1 - wy) * z0 + wy * z1
    out = np.where(cnt >= 4, smooth, fb)
    return np.where(q.oob, np.nan, out)
