"""Tiled windowed-fill Pallas kernels.

Strategy (one program per output tile):
1. DMA the (TH+2R, TW+2R) halo-extended elevation/validity slab from HBM into
   VMEM scratch (the host wrapper pre-pads the planes so every slab read is
   in-bounds and padding has validity 0).
2. Loop over the statically distance-sorted offset table (scalar-prefetched
   into SMEM) in chunks; each offset contributes the slab window shifted by
   (dy, dx) — a VMEM dynamic slice, no HBM traffic.
3. First-k-valid accumulation in VMEM state planes, with a per-chunk
   global-saturation early exit (jnp.min(cnt) >= k) via lax.while_loop.
4. Write the finished tile.

Semantics are identical to auvtpu.ops.dense (same offset order, same
first-k-valid rule, same early-exit condition evaluated per tile — the exit
fires only when no cell in the tile can accept candidates, so results match
the full scan bit-for-bit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IDWConfig
from ..grid import RegularGrid
from ..ops.dense import _padded_tables, _CHUNK


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except Exception:
        return False
    return True


def _pad_for_tiles(grid: RegularGrid, tile: tuple[int, int], radius: int):
    """Pad planes to tile multiples plus the halo ring; validity 0 outside.

    The right/bottom margins are extended so every tile can DMA a full
    aligned (SH, SW) slab (Mosaic requires DMA slice shapes aligned to the
    (8, 128) tiling)."""
    th, tw = tile
    H, W = grid.shape
    Hp = -(-H // th) * th
    Wp = -(-W // tw) * tw
    sh, sw = _slab_shape(radius, th, tw)
    pad_b = (Hp - th + sh) - H - radius
    pad_r = (Wp - tw + sw) - W - radius
    pe = jnp.pad(grid.elev, ((radius, pad_b), (radius, pad_r)), mode="edge")
    pv = jnp.pad(
        grid.valid, ((radius, pad_b), (radius, pad_r)),
        mode="constant", constant_values=0.0,
    )
    return pe, pv, Hp, Wp


def _slab_shape(radius: int, th: int, tw: int):
    """Scratch slab shape: the (th+2R, tw+2R) halo window rounded up to the
    f32 (8, 128) vector tiling — tpu.dynamic_rotate rejects unaligned
    shapes."""
    sh = -(-(th + 2 * radius) // 8) * 8
    sw = -(-(tw + 2 * radius) // 128) * 128
    return sh, sw


def _clamp_tile(shape, tile):
    """Shrink a requested tile to the grid it will cover: a tile larger than
    the (8,128)-aligned plane pads every block with dead cells — a 12x64
    sharded band under the (64,256) bench-winning default would run 21x the
    work.  Keeps sublane multiples of 8 and lane multiples of 128 (the f32
    vector tiling)."""
    H, W = shape
    th = min(tile[0], max(8, -(-H // 8) * 8))
    tw = min(tile[1], max(128, -(-W // 128) * 128))
    return th, tw


def _window_reader(slab_ref, radius, th, tw):
    """Return window(dy, dx) -> (th, tw) view of the slab shifted by the
    (traced) offsets.  Mosaic requires sublane-dim dynamic slices to be
    8-aligned, so instead of slicing at (dy, dx) we roll the slab by (-dy,
    -dx) (dynamic rotates on aligned shapes are supported) and take the
    static [0:th, 0:tw] corner; the circular wraparound only reaches rows >=
    th + 2R - dy >= th, which the static slice never reads.

    Roll-order optimization (bit-exact: the same elements land in the static
    corner): lane-roll the full (sh, sw) slab first, then statically drop the
    lane tiles past ceil(tw/128)*128 before the sublane roll — the sublane
    roll runs on the narrowed slab (e.g. (56,128) instead of (56,256) for the
    production (32,128)/R=10 shape), cutting roll traffic ~25%."""
    from jax.experimental.pallas import tpu as pltpu

    sh, sw = _slab_shape(radius, th, tw)
    keep_w = min(sw, -(-tw // 128) * 128)

    def window(dy, dx):
        x = slab_ref[:]
        x = pltpu.roll(x, sw - dx, 1)
        if keep_w < sw:
            x = x[:, 0:keep_w]
        x = pltpu.roll(x, sh - dy, 0)
        return x[0:th, 0:tw]

    return window


def _static_window_reader(slab_ref, radius, th, tw):
    """Static-offset twin of _window_reader for the peeled first chunk.

    The offset table is host-static, and the while-loop condition forces
    chunk 0 on every tile — so its 9 windows can be read with *compile-time*
    offsets: one slab load, then a static lax.slice per offset.  A static
    slice materializes only the (th, tw) window (shift + extract), versus the
    dynamic path's two whole-slab rotates (~3.5x the data movement for the
    production (32,128)/R=10 shape).  Same elements, same order — bit-exact.
    """
    x = slab_ref[:]

    def window(dy0: int, dx0: int):
        # dy0/dx0 are python ints in [0, 2R] (table value + R)
        return jax.lax.slice(x, (dy0, dx0), (dy0 + th, dx0 + tw))

    return window


def _peel_tables(radius: int, convention: str = "reference"):
    """Host-static (dy0, dx0, live, d2) rows of chunk 0 of the sorted offset
    table, as plain python scalars for baking into the kernel."""
    dxs, dys, d2s, live, n_chunks = _padded_tables(radius, convention)
    n = min(_CHUNK, len(dxs))
    rows = [
        (int(dys[t]) + radius, int(dxs[t]) + radius, float(live[t]), float(d2s[t]))
        for t in range(n)
    ]
    return rows, n_chunks


def _db_fetch(pairs, sem, th: int, tw: int, sh: int, sw: int, nbuf: int = 2):
    """Multi-buffered halo-slab prefetch across sequential grid programs.

    The per-tile fetch used to be strictly serial (start, wait, compute) and
    dominated the kernel at ~3.8 us/tile of DMA latency (the r3 breakdown
    probe measured scan9 at 4.91 ms of a 6.8 ms kernel).  Scratch persists
    across grid programs and TPU iterates the grid sequentially on one core,
    so program g prefetches tile g+nbuf-1's slab into a rotating buffer while
    it computes — the classic cross-program pipelining idiom.  nbuf=2 hides
    one tile of DMA latency under one tile of compute; deeper rings hide
    latency longer than a single tile's compute.

    pairs: [(hbm_ref, slab_ref)] with slab_ref leading dim nbuf.
    sem: DMA semaphores shaped (nbuf, len(pairs)).
    Returns the ready slot for this program's tile.

    Buffer safety: at program g the tiles in flight are g..g+nbuf-1, exactly
    nbuf distinct slots; the slot written for tile g+nbuf-1 is (g-1) mod
    nbuf, whose compute finished when program g-1 retired.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    last = ni * nj - 1  # static: the pallas grid is shape-derived
    lin = i * nj + j
    slot = jax.lax.rem(lin, nbuf)
    D = nbuf - 1

    def copies(ti, tj, s):
        return [
            pltpu.make_async_copy(
                hbm.at[pl.ds(ti * th, sh), pl.ds(tj * tw, sw)],
                slab.at[s],
                sem.at[s, p],
            )
            for p, (hbm, slab) in enumerate(pairs)
        ]

    @pl.when(lin == 0)
    def _():
        # warm up tiles 0..D-1 (tile D is issued by the steady branch below)
        for t in range(min(D, last + 1)):
            for c in copies(t // nj, t % nj, t % nbuf):
                c.start()

    @pl.when(lin + D <= last)
    def _():
        # (i, j) + D in row-major order, without scalar integer division:
        # tj wraps at most ceil(D / nj) times
        ti, tj = i, j + D
        for _ in range(max(1, -(-D // nj))):
            w = tj >= nj
            ti = jnp.where(w, ti + 1, ti)
            tj = jnp.where(w, tj - nj, tj)
        for c in copies(ti, tj, jax.lax.rem(lin + D, nbuf)):
            c.start()

    for c in copies(i, j, slot):
        c.wait()
    return slot


def _pad_saturated_cnt(hw_ref, th: int, tw: int, k: int):
    """Initial per-cell candidate count: 0 inside the real grid, k (already
    saturated) on the right/bottom padding cells.

    Padding cells are all-invalid, so with a zero init they can never reach
    k and the 84 edge tiles of the bench workload ran ALL 49 offset chunks
    (73% of total chunk work) before the unconditional n_chunks stop.
    Starting them saturated lets the early exit fire as soon as the REAL
    cells are done; pad outputs are garbage but are sliced off by the host
    wrapper, and real cells' collection is untouched — bit-exact."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + i * th
    col = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + j * tw
    in_b = (row < hw_ref[0]) & (col < hw_ref[1])
    return jnp.where(in_b, 0.0, float(k)).astype(jnp.float32)


def _make_fill_kernel(kind: str, k: int, power: float, radius: int, th: int, tw: int, n_chunks: int, eps: float, nbuf: int = 2, peel_rows=()):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(dy_ref, dx_ref, w_ref, hw_ref, elev_hbm, valid_hbm, out_ref, slab_e2, slab_v2, sem):
        sh, sw = _slab_shape(radius, th, tw)
        slot = _db_fetch(
            [(elev_hbm, slab_e2), (valid_hbm, slab_v2)], sem, th, tw, sh, sw, nbuf
        )
        slab_e = slab_e2.at[slot]
        slab_v = slab_v2.at[slot]

        zero = jnp.zeros((th, tw), jnp.float32)
        cnt0 = _pad_saturated_cnt(hw_ref, th, tw, k)
        if kind == "idw":
            st0 = (cnt0, zero, zero)  # cnt, wsum, vsum
        else:
            st0 = (cnt0, zero)  # cnt, sum

        # ---- static peel of chunk 0 (every tile runs it; see _static_window_reader)
        # peel_rows carry (dy0, dx0, wj) with wj taken verbatim from the f32
        # host weight table, so the embedded constants are bit-identical to
        # what the dynamic path reads from w_ref
        swin_e = _static_window_reader(slab_e, radius, th, tw)
        swin_v = _static_window_reader(slab_v, radius, th, tw)
        for dy0, dx0, wj_s in peel_rows:
            if wj_s <= 0.0:
                continue
            v = swin_e(dy0, dx0)
            ok = swin_v(dy0, dx0)
            if kind == "idw":
                cnt, ws, vs = st0
                take = ok * (cnt < k)
                w = take * wj_s
                st0 = (cnt + take, ws + w, vs + w * v)
            else:
                cnt, s = st0
                take = ok * (cnt < k)
                st0 = (cnt + take, s + take * v)
        init = st0

        def cond(carry):
            c, st = carry
            return (c < n_chunks) & (jnp.min(st[0]) < k)

        win_e = _window_reader(slab_e, radius, th, tw)
        win_v = _window_reader(slab_v, radius, th, tw)

        def body(carry):
            c, st = carry
            base = c * _CHUNK
            for t in range(_CHUNK):
                idx = base + t
                dy = dy_ref[idx]
                dx = dx_ref[idx]
                wj = w_ref[idx]  # host-precomputed 1/(d2^(p/2)+eps); 0 = dead
                live = wj > 0.0
                v = win_e(dy, dx)
                ok = win_v(dy, dx)
                if kind == "idw":
                    cnt, ws, vs = st
                    take = jnp.where(live, ok * (cnt < k), 0.0)
                    w = take * wj
                    st = (cnt + take, ws + w, vs + w * v)
                else:
                    cnt, s = st
                    take = jnp.where(live, ok * (cnt < k), 0.0)
                    st = (cnt + take, s + take * v)
            return (c + 1, st)

        _, st = jax.lax.while_loop(cond, body, (jnp.asarray(1, jnp.int32), init))
        if kind == "idw":
            cnt, ws, vs = st
            out_ref[:] = jnp.where(cnt > 0, vs / jnp.maximum(ws, eps), jnp.nan)
        else:
            cnt, s = st
            out_ref[:] = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), jnp.nan)

    return kernel


@partial(
    jax.jit,
    static_argnames=("kind", "k", "power", "max_radius", "tile", "prefetch"),
)
def _pallas_fill(grid: RegularGrid, *, kind: str, k: int, power: float, max_radius: int, tile=(32, 128), prefetch: int = 2):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = max_radius
    th, tw = _clamp_tile(grid.shape, tile)
    tile = (th, tw)
    H, W = grid.shape
    pe, pv, Hp, Wp = _pad_for_tiles(grid, tile, R)
    dxs, dys, d2s, live, n_chunks = _padded_tables(R)
    # dy/dx become slab-relative starts in [0, 2R]; distance weights are a
    # pure function of the static offset table, so they are precomputed here
    # (Mosaic has no powf) with 0 marking dead (padding) entries
    eps = IDWConfig().eps
    dy_tab = jnp.asarray(dys + R, jnp.int32)
    dx_tab = jnp.asarray(dxs + R, jnp.int32)
    if kind == "idw":
        w_np = 1.0 / (d2s ** (power / 2.0) + eps)
    else:
        w_np = np.ones_like(d2s)
    w_tab = jnp.asarray(np.where(live > 0, w_np, 0.0), jnp.float32)

    w_masked = np.where(live > 0, w_np, 0.0).astype(np.float32)
    peel_rows = [
        (int(dys[t]) + R, int(dxs[t]) + R, float(w_masked[t]))
        for t in range(min(_CHUNK, len(dxs)))
    ]
    kernel = _make_fill_kernel(kind, k, power, R, th, tw, n_chunks, eps, prefetch, peel_rows)

    hw_tab = jnp.asarray([H, W], jnp.int32)
    sh, sw = _slab_shape(R, th, tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Hp // th, Wp // tw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (th, tw), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((prefetch, sh, sw), jnp.float32),
            pltpu.VMEM((prefetch, sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA((prefetch, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        grid_spec=grid_spec,
    )(dy_tab, dx_tab, w_tab, hw_tab, pe.astype(jnp.float32), pv.astype(jnp.float32))
    return out[:H, :W]


def pallas_fill_idw(grid: RegularGrid, *, k: int = 8, power: float = 2.0, max_radius: int = 10, tile=(32, 128), prefetch: int = 2):
    """Pallas twin of ops.dense.fill_idw."""
    return _pallas_fill(grid, kind="idw", k=k, power=power, max_radius=max_radius, tile=tile, prefetch=prefetch)


def pallas_fill_mean(grid: RegularGrid, *, k: int = 4, max_radius: int = 10, tile=(32, 128), prefetch: int = 2):
    """Pallas twin of ops.dense.fill_window_mean."""
    return _pallas_fill(grid, kind="mean", k=k, power=0.0, max_radius=max_radius, tile=tile, prefetch=prefetch)


# ---------------------------------------------------------------------------
# top-k slot-index kernel (kriging front end)
# ---------------------------------------------------------------------------

def _make_topk_kernel(k: int, radius: int, th: int, tw: int, n_chunks: int, nbuf: int = 2, peel_rows=()):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(dy_ref, dx_ref, live_ref, hw_ref, valid_hbm, cnt_ref, idx_ref, slab_v2, sem):
        sh, sw = _slab_shape(radius, th, tw)
        slot = _db_fetch([(valid_hbm, slab_v2)], sem, th, tw, sh, sw, nbuf)
        slab_v = slab_v2.at[slot]

        zero = jnp.zeros((th, tw), jnp.float32)
        cnt0 = _pad_saturated_cnt(hw_ref, th, tw, k)
        st0 = (cnt0, tuple(zero - 1.0 for _ in range(k)))

        # ---- static peel of chunk 0 (see _static_window_reader)
        swin_v = _static_window_reader(slab_v, radius, th, tw)
        for t, (dy0, dx0, live_s, _d2) in enumerate(peel_rows):
            if live_s <= 0.0:
                continue
            cnt, idxs = st0
            ok = swin_v(dy0, dx0)
            take = ok * (cnt < k)
            jf = float(t)
            idxs = tuple(
                idxs[s] + take * jnp.where(cnt == s, 1.0, 0.0) * (jf - idxs[s])
                for s in range(k)
            )
            st0 = (cnt + take, idxs)
        init = st0

        def cond(carry):
            c, st = carry
            return (c < n_chunks) & (jnp.min(st[0]) < k)

        win_v = _window_reader(slab_v, radius, th, tw)

        def body(carry):
            c, (cnt, idxs) = carry
            base = c * _CHUNK
            for t in range(_CHUNK):
                oi = base + t
                dy = dy_ref[oi]
                dx = dx_ref[oi]
                live = live_ref[oi] > 0.0
                ok = win_v(dy, dx)
                take = jnp.where(live, ok * (cnt < k), 0.0)
                jf = oi.astype(jnp.float32)
                idxs = tuple(
                    idxs[s] + take * jnp.where(cnt == s, 1.0, 0.0) * (jf - idxs[s])
                    for s in range(k)
                )
                cnt = cnt + take
            return (c + 1, (cnt, idxs))

        _, (cnt, idxs) = jax.lax.while_loop(cond, body, (jnp.asarray(1, jnp.int32), init))
        cnt_ref[:] = cnt
        for s in range(k):
            idx_ref[s] = idxs[s]

    return kernel


@partial(jax.jit, static_argnames=("k", "max_radius", "tile", "prefetch"))
def pallas_topk_idx(grid: RegularGrid, *, k: int = 4, max_radius: int = 10, tile=(32, 128), prefetch: int = 2):
    """Pallas twin of ops.dense.window_topk_idx: (cnt, [idx planes])."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = max_radius
    th, tw = _clamp_tile(grid.shape, tile)
    tile = (th, tw)
    H, W = grid.shape
    _, pv, Hp, Wp = _pad_for_tiles(grid, tile, R)
    dxs, dys, d2s, live, n_chunks = _padded_tables(R)
    dy_tab = jnp.asarray(dys + R, jnp.int32)
    dx_tab = jnp.asarray(dxs + R, jnp.int32)
    live_tab = jnp.asarray(live, jnp.float32)

    peel_rows, _ = _peel_tables(R)
    kernel = _make_topk_kernel(k, R, th, tw, n_chunks, prefetch, peel_rows)
    hw_tab = jnp.asarray([H, W], jnp.int32)
    sh, sw = _slab_shape(R, th, tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Hp // th, Wp // tw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((th, tw), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k, th, tw), lambda i, j, *_: (0, i, j), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((prefetch, sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA((prefetch, 1)),
        ],
    )
    cnt, idxs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((k, Hp, Wp), jnp.float32),
        ),
        grid_spec=grid_spec,
    )(dy_tab, dx_tab, live_tab, hw_tab, pv.astype(jnp.float32))
    return cnt[:H, :W], [idxs[s, :H, :W] for s in range(k)]


# ---------------------------------------------------------------------------
# value-carrying top-k kernel (kriging front end, gather-free)
# ---------------------------------------------------------------------------
#
# Carries (cnt, k values, k packed-offset codes) per tile in VMEM with a
# per-tile early exit — interior tiles saturate within ~3 chunks while the
# XLA whole-plane loop must run to the *global* worst cell.  The elevation
# and validity ride in ONE NaN-encoded slab (half the DMA traffic); slot
# updates use selects, never arithmetic, so NaN cannot leak.

def _make_topk_full_kernel(k: int, radius: int, th: int, tw: int, n_chunks: int, nbuf: int = 2, peel_rows=()):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    code_base = 2 * radius + 12  # packing stride for (dx+R, dy+R)

    def kernel(dy_ref, dx_ref, live_ref, hw_ref, nanp_hbm, out_ref, slab2, sem):
        sh, sw = _slab_shape(radius, th, tw)
        slot = _db_fetch([(nanp_hbm, slab2)], sem, th, tw, sh, sw, nbuf)
        slab = slab2.at[slot]

        zero = jnp.zeros((th, tw), jnp.float32)
        cnt0 = _pad_saturated_cnt(hw_ref, th, tw, k)
        st0 = (cnt0, tuple(zero for _ in range(k)), tuple(zero - 1.0 for _ in range(k)))

        # ---- static peel of chunk 0 (see _static_window_reader)
        swin = _static_window_reader(slab, radius, th, tw)
        for dy0, dx0, live_s, _d2 in peel_rows:
            if live_s <= 0.0:
                continue
            cnt, vals, codes = st0
            v = swin(dy0, dx0)
            okv = jnp.logical_not(jnp.isnan(v))
            take = jnp.where(okv, (cnt < k).astype(jnp.float32), 0.0)
            code_s = float(dx0 * code_base + dy0)
            nv, nc = [], []
            for s in range(k):
                hit = (take > 0) & (cnt == s)
                nv.append(jnp.where(hit, v, vals[s]))
                nc.append(jnp.where(hit, code_s, codes[s]))
            st0 = (cnt + take, tuple(nv), tuple(nc))
        init = st0
        win = _window_reader(slab, radius, th, tw)

        def cond(carry):
            c, (cnt, _v, _o) = carry
            return (c < n_chunks) & (jnp.min(cnt) < k)

        def body(carry):
            c, (cnt, vals, codes) = carry
            base = c * _CHUNK
            for t in range(_CHUNK):
                oi = base + t
                dy = dy_ref[oi]
                dx = dx_ref[oi]
                live = live_ref[oi] > 0.0
                v = win(dy, dx)
                okv = jnp.logical_not(jnp.isnan(v))
                take = jnp.where(live & okv, (cnt < k).astype(jnp.float32), 0.0)
                code = (dx.astype(jnp.float32) * code_base + dy.astype(jnp.float32))
                nv, nc = [], []
                for s in range(k):
                    hit = (take > 0) & (cnt == s)
                    nv.append(jnp.where(hit, v, vals[s]))
                    nc.append(jnp.where(hit, code, codes[s]))
                cnt = cnt + take
                vals, codes = tuple(nv), tuple(nc)
            return (c + 1, (cnt, vals, codes))

        _, (cnt, vals, codes) = jax.lax.while_loop(
            cond, body, (jnp.asarray(1, jnp.int32), init)
        )
        out_ref[0] = cnt
        for s in range(k):
            out_ref[1 + s] = vals[s]
            out_ref[1 + k + s] = codes[s]

    return kernel


@partial(jax.jit, static_argnames=("k", "max_radius", "tile", "convention", "prefetch"))
def pallas_topk_full(grid: RegularGrid, *, k: int = 4, max_radius: int = 10, tile=(32, 128), convention: str = "reference", prefetch: int = 2):
    """Value-carrying first-k-valid selection: returns (cnt, vals list,
    dxs list, dys list) planes — a drop-in for ops.dense.window_topk_planes
    with per-tile early exit."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = max_radius
    th, tw = _clamp_tile(grid.shape, tile)
    tile = (th, tw)
    H, W = grid.shape
    # NaN-encoded single slab: invalid and out-of-grid cells are NaN
    nan_grid = RegularGrid(
        elev=jnp.where(grid.valid > 0.5, grid.elev, jnp.nan),
        valid=grid.valid,
        min_lon=grid.min_lon, max_lon=grid.max_lon,
        min_lat=grid.min_lat, max_lat=grid.max_lat,
    )
    th_, tw_ = tile
    sh, sw = _slab_shape(R, th_, tw_)
    Hp = -(-H // th_) * th_
    Wp = -(-W // tw_) * tw_
    pad_b = (Hp - th_ + sh) - H - R
    pad_r = (Wp - tw_ + sw) - W - R
    nanp = jnp.pad(nan_grid.elev, ((R, pad_b), (R, pad_r)), constant_values=jnp.nan)

    dxs, dys, d2s, live, n_chunks = _padded_tables(R, convention)
    dy_tab = jnp.asarray(dys + R, jnp.int32)
    dx_tab = jnp.asarray(dxs + R, jnp.int32)
    live_tab = jnp.asarray(live, jnp.float32)

    peel_rows, _ = _peel_tables(R, convention)
    kernel = _make_topk_full_kernel(k, R, th, tw, n_chunks, prefetch, peel_rows)
    hw_tab = jnp.asarray([H, W], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Hp // th, Wp // tw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1 + 2 * k, th, tw), lambda i, j, *_: (0, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((prefetch, sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA((prefetch, 1)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1 + 2 * k, Hp, Wp), jnp.float32),
        grid_spec=grid_spec,
    )(dy_tab, dx_tab, live_tab, hw_tab, nanp)
    cnt = out[0, :H, :W]
    vals = [out[1 + s, :H, :W] for s in range(k)]
    code_base = 2 * R + 12
    dxs_o, dys_o = [], []
    for s in range(k):
        code = out[1 + k + s, :H, :W]
        # empty slots carry code -1; max(code, 0) decodes them to
        # (dx, dy) = (-R, -R), NOT (0, 0).  This is safe only because every
        # consumer masks slots >= cnt (the kriging path falls back to the
        # mean when cnt < 4) — any new caller must preserve that invariant.
        c = jnp.maximum(code, 0.0)
        dx = jnp.floor(c / code_base) - R
        dy = c - (dx + R) * code_base - R
        dxs_o.append(dx)
        dys_o.append(dy)
    # zero empty-slot values (the reference fallback mean divides by cnt)
    slot_id = jnp.arange(k)
    vals = [jnp.where(cnt > s, v, 0.0) for s, v in zip(range(k), vals)]
    return cnt, vals, dxs_o, dys_o


# ---------------------------------------------------------------------------
# fully-fused kriging fill kernel: selection + 5x6 Gauss-Jordan in VMEM
# ---------------------------------------------------------------------------

def _make_kriging_fill_kernel(radius: int, th: int, tw: int, n_chunks: int, model: str = "exponential", solver: str = "lu", nbuf: int = 2, peel_rows=(), with_variance: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 4
    code_base = 2 * radius + 12

    def kernel(dy_ref, dx_ref, live_ref, par_ref, hw_ref, nanp_hbm, out_ref, slab2, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        sh, sw = _slab_shape(radius, th, tw)
        slot = _db_fetch([(nanp_hbm, slab2)], sem, th, tw, sh, sw, nbuf)
        slab = slab2.at[slot]

        zero = jnp.zeros((th, tw), jnp.float32)
        cnt0 = _pad_saturated_cnt(hw_ref, th, tw, K)
        st0 = (cnt0, tuple(zero for _ in range(K)), tuple(zero - 1.0 for _ in range(K)))

        # ---- static peel of chunk 0 (see _static_window_reader)
        swin = _static_window_reader(slab, radius, th, tw)
        for dy0, dx0, live_s, _d2 in peel_rows:
            if live_s <= 0.0:
                continue
            cnt, vals, codes = st0
            v = swin(dy0, dx0)
            okv = jnp.logical_not(jnp.isnan(v))
            take = jnp.where(okv, (cnt < K).astype(jnp.float32), 0.0)
            code_s = float(dx0 * code_base + dy0)
            nv, nc = [], []
            for s in range(K):
                hit = (take > 0) & (cnt == s)
                nv.append(jnp.where(hit, v, vals[s]))
                nc.append(jnp.where(hit, code_s, codes[s]))
            st0 = (cnt + take, tuple(nv), tuple(nc))
        init = st0
        win = _window_reader(slab, radius, th, tw)

        def cond(carry):
            c, (cnt, _v, _o) = carry
            return (c < n_chunks) & (jnp.min(cnt) < K)

        def body(carry):
            c, (cnt, vals, codes) = carry
            base = c * _CHUNK
            for t in range(_CHUNK):
                oi = base + t
                dy = dy_ref[oi]
                dx = dx_ref[oi]
                live = live_ref[oi] > 0.0
                v = win(dy, dx)
                okv = jnp.logical_not(jnp.isnan(v))
                take = jnp.where(live & okv, (cnt < K).astype(jnp.float32), 0.0)
                code = dx.astype(jnp.float32) * code_base + dy.astype(jnp.float32)
                nv, nc = [], []
                for s in range(K):
                    hit = (take > 0) & (cnt == s)
                    nv.append(jnp.where(hit, v, vals[s]))
                    nc.append(jnp.where(hit, code, codes[s]))
                cnt = cnt + take
                vals, codes = tuple(nv), tuple(nc)
            return (c + 1, (cnt, vals, codes))

        _, (cnt, vals, codes) = jax.lax.while_loop(
            cond, body, (jnp.asarray(1, jnp.int32), init)
        )

        # ---- decode offsets and build the kriging system as plane registers
        nugget = par_ref[0]
        sill = par_ref[1]
        vrange = par_ref[2]
        min_lon = par_ref[3]
        min_lat = par_ref[4]
        lon_step = par_ref[5]
        lat_step = par_ref[6]
        half = par_ref[7]
        pivot_tol = par_ref[8]
        row0 = par_ref[9]
        col0 = par_ref[10]

        # tile (i, j)'s first output cell is global (row0 + i*th, col0 + j*tw)
        # in unpadded grid coordinates (the halo only shifts the slab reads,
        # not out_ref); row0/col0 support sub-plane (sharded-block) execution.
        # All addends are integers < 2^24, so the f32 sums are exact and
        # order-independent — bit-identical to the XLA path's iota + col0.
        col = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32) + (j * tw).astype(jnp.float32) + col0
        row = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32) + (i * th).astype(jnp.float32) + row0
        qlon = min_lon + col * lon_step
        qlat = min_lat + row * lat_step

        cx, cy, vz = [], [], []
        for s in range(K):
            c_ = jnp.maximum(codes[s], 0.0)
            dxs = jnp.floor(c_ / code_base) - radius
            dys = c_ - (dxs + radius) * code_base - radius
            cx.append(min_lon + (col + dxs + half) * lon_step)
            cy.append(min_lat + (row + dys + half) * lat_step)
            vz.append(jnp.where(cnt > s, vals[s], 0.0))

        def gamma(h):
            # static model branch (variogram.variogram_model's zoo; no powf
            # in Mosaic, so every model is exp/min/poly based)
            if model == "exponential":
                return nugget + sill * (1.0 - jnp.exp(-h / vrange))
            if model == "linear":
                return nugget + sill * h
            if model == "spherical":
                m_ = jnp.minimum(h / vrange, 1.0)
                return nugget + sill * (1.5 * m_ - 0.5 * m_ * m_ * m_)
            if model == "gaussian":
                hr = h / vrange
                return nugget + sill * (1.0 - jnp.exp(-(hr * hr)))
            raise ValueError(model)

        one = jnp.ones((th, tw), jnp.float32)
        M = [[None] * 6 for _ in range(5)]
        for a in range(K):
            for b in range(K):
                if b < a:
                    M[a][b] = M[b][a]
                    continue
                if b == a:
                    # gamma(0) is exactly the nugget for every zoo model
                    # (exp(0)=1, min(0,1)=0 are exact in f32) — skip 4 of the
                    # 14 sqrt+exp gamma evaluations, bit-identically
                    M[a][b] = zero + nugget
                    continue
                ddx = cx[a] - cx[b]
                ddy = cy[a] - cy[b]
                M[a][b] = gamma(jnp.sqrt(ddx * ddx + ddy * ddy))
            M[a][4] = one
            ddx = cx[a] - qlon
            ddy = cy[a] - qlat
            M[a][5] = gamma(jnp.sqrt(ddx * ddx + ddy * ddy))
        M[4] = [one, one, one, one, zero, one]
        gamma0 = [M[a][5] for a in range(K)] if with_variance else None

        singular = jnp.zeros((th, tw), bool)
        if solver == "gj":
            # unpivoted Gauss-Jordan, op-ordered like ops.scattered.krige_solve
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
            lam = [M[a][5] for a in range(K)]
        elif solver == "lu":
            # forward elimination + back-substitution: ~70 plane-FMAs + 5
            # reciprocals vs Gauss-Jordan's ~100 FMAs + 21 divides.  Same
            # unpivoted pivot sequence (the kriging matrix is grid-separated
            # — neighbors are >= 1 cell apart — so pivots are well away from
            # zero unless the system is exactly degenerate, which the same
            # pivot_tol bailout catches; values agree with the GJ path to
            # f32 roundoff, covered by the pallas-vs-xla tolerance tests).
            rp = [None] * 5
            for p_ in range(5):
                pivot = M[p_][p_]
                singular = singular | (jnp.abs(pivot) < pivot_tol)
                rp[p_] = 1.0 / jnp.where(singular, 1.0, pivot)
                for r_ in range(p_ + 1, 5):
                    f = M[r_][p_] * rp[p_]
                    for q in range(p_ + 1, 6):
                        M[r_][q] = M[r_][q] - f * M[p_][q]
            lam = [None] * 5
            for p_ in reversed(range(5)):
                acc = M[p_][5]
                for q in range(p_ + 1, 5):
                    acc = acc - M[p_][q] * lam[q]
                lam[p_] = acc * rp[p_]
        else:
            raise ValueError(solver)

        pred = lam[0] * vz[0] + lam[1] * vz[1] + lam[2] * vz[2] + lam[3] * vz[3]
        fbs = vz[0] + vz[1] + vz[2] + vz[3]
        fb = jnp.where(cnt > 0, fbs / jnp.maximum(cnt, 1.0), jnp.nan)
        bail = singular | (cnt < K)
        if not with_variance:
            out_ref[:] = jnp.where(bail, fb, pred)
            return
        # ordinary-kriging prediction variance: sigma^2 = sum_i w_i gamma_i0
        # + mu (op-ordered like ops.scattered.krige_solve_cols; fallback
        # cells have no defined variance)
        mu = M[4][5] if solver == "gj" else lam[4]
        var = sum(lam[a] * gamma0[a] for a in range(K)) + mu
        var = jnp.maximum(var, 0.0)
        out_ref[0] = jnp.where(bail, fb, pred)
        out_ref[1] = jnp.where(bail, jnp.nan, var)

    return kernel


@partial(jax.jit, static_argnames=("max_radius", "tile", "convention", "model", "solver", "prefetch", "with_variance"))
def pallas_fill_kriging(grid: RegularGrid, *, max_radius: int = 10, tile=(64, 256), convention: str = "reference", vparams=None, model: str = "exponential", solver: str = "gj", prefetch: int = 2, with_variance: bool = False, row0=0, col0=0, steps=None):
    """Fully-fused ordinary-kriging fill: window selection AND the batched
    5x6 solve run per tile in VMEM — one HBM read of the grid, one write of
    the prediction plane.  Defaults tile=(64,256)/solver='gj'/prefetch=2: the
    post-peel interleaved-median chip sweep's consistent winner (4.90 ms
    median on the bench workload vs 5.44-6.23 for every other candidate,
    results/fused_tile_confirm_r4.txt); 'gj' (Gauss-Jordan) is additionally
    bit-identical to the XLA path, 'lu' (forward elim + back-sub) within
    1.5e-3.  with_variance=True additionally returns the ordinary-kriging
    prediction-variance plane (sigma^2, NaN at fallback cells) — the Pallas
    twin of ops.fill_kriging(with_variance=True)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..config import KrigingConfig

    cfg = KrigingConfig()
    if vparams is None:
        vparams = (cfg.variogram.nugget, cfg.variogram.sill, cfg.variogram.range)
    R = max_radius
    th, tw = _clamp_tile(grid.shape, tile)
    H, W = grid.shape
    sh, sw = _slab_shape(R, th, tw)
    Hp = -(-H // th) * th
    Wp = -(-W // tw) * tw
    pad_b = (Hp - th + sh) - H - R
    pad_r = (Wp - tw + sw) - W - R
    nanp = jnp.pad(
        jnp.where(grid.valid > 0.5, grid.elev, jnp.nan),
        ((R, pad_b), (R, pad_r)), constant_values=jnp.nan,
    )

    dxs, dys, d2s, live, n_chunks = _padded_tables(R, convention)
    dy_tab = jnp.asarray(dys + R, jnp.int32)
    dx_tab = jnp.asarray(dxs + R, jnp.int32)
    live_tab = jnp.asarray(live, jnp.float32)
    half = 0.5 if convention == "reference" else 0.0
    lat_step, lon_step = (grid.lat_step, grid.lon_step) if steps is None else steps
    par = jnp.asarray(
        [
            vparams[0], vparams[1], vparams[2],
            grid.min_lon, grid.min_lat, lon_step, lat_step,
            half, cfg.pivot_tol, row0, col0,
        ],
        jnp.float32,
    )

    peel_rows, _ = _peel_tables(R, convention)
    kernel = _make_kriging_fill_kernel(
        R, th, tw, n_chunks, model, solver, prefetch, peel_rows, with_variance
    )
    hw_tab = jnp.asarray([H, W], jnp.int32)
    sh, sw = _slab_shape(R, th, tw)
    if with_variance:
        out_specs = pl.BlockSpec(
            (2, th, tw), lambda i, j, *_: (0, i, j), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((2, Hp, Wp), jnp.float32)
    else:
        out_specs = pl.BlockSpec(
            (th, tw), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(Hp // th, Wp // tw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((prefetch, sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA((prefetch, 1)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
    )(dy_tab, dx_tab, live_tab, par, hw_tab, nanp)
    if with_variance:
        return out[0, :H, :W], out[1, :H, :W]
    return out[:H, :W]
