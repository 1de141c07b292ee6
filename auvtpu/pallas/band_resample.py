"""Pallas chunked windowed-bilinear resample — OPT-IN; measured SLOWER than
the XLA path on chip (results/resample_probe_r4.txt: band 36.6 vs 29.1 ms,
atlas 37.6 vs 34.9 at 5M queries, interleaved medians).

The hypothesis was that `ops.band._band_resample` is HBM-bound on its
(N, wc) intermediates (rows_v + the column one-hot, 2.6 GB each at 5M
queries), so fusing each chunk into VMEM — DMA the (wrp, wcp) window slab
(double-buffered, dynamic 8/128-aligned base + page index from scalar
prefetch), MXU row-lerp, column-pick reduce, ~0.6 GB total HBM — should win
~2x.  The chip refuted it: per-chunk time is flat at ~3.7 us whether the
grid step serves 1 or 4 chunks (cpg), i.e. both paths are bound by the
per-query one-hot VPU WORK (which fusing does not shrink), and the kernel
adds per-chunk overhead on top.  Kept as a tested, parity-exact opt-in
(`backend="pallas"` on the resamplers) and as the measured record of why
the XLA path stays the default; the next real lever would be shrinking the
one-hot math itself (two-level hi/lo column decomposition), not fusion.

Semantics match `_band_resample` / `_atlas_resample` for resolved queries
(same one-hot math).  The resolved mask is computed host-side against the
SAME aligned windows, so escalation behavior is identical in kind; the wider
aligned window (wcp = wc + 128) means strictly MORE queries resolve than the
XLA path at equal nominal wc.  Undefined-cell (masked) bands are NOT
supported — the resamplers fall back to the XLA path.

Alignment rules honored (CLAUDE.md hard-won list): dynamic sublane (row)
DMA bases are 8-aligned, lane (col) bases 128-aligned, slab shapes
(8k, 128m); planes are padded to (8, 128) multiples host-side.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _ceil_to(v: int, m: int) -> int:
    return -(-int(v) // m) * m


def _make_kernel(chunk: int, wrp: int, wcp: int, nbuf: int, cpg: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(pg_ref, by_ref, bx_ref, lx_ref, ly_ref, planes_hbm, z_ref,
               slab, sem):
        # grid step g serves cpg chunks; the slab ring double-buffers whole
        # GROUPS of cpg windows so per-step overhead amortizes over cpg
        # chunks of compute
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        slot = jax.lax.rem(g, nbuf)

        def copies(t, s):
            return [
                pltpu.make_async_copy(
                    planes_hbm.at[pg_ref[t * cpg + i],
                                  pl.ds(pl.multiple_of(by_ref[t * cpg + i], 8), wrp),
                                  pl.ds(pl.multiple_of(bx_ref[t * cpg + i], 128), wcp)],
                    slab.at[s, i],
                    sem.at[s, i],
                )
                for i in range(cpg)
            ]

        @pl.when(g == 0)
        def _():
            # warm up slots 0..nbuf-2 (slot for g+nbuf-1 is issued below)
            for t in range(nbuf - 1):
                @pl.when(t <= ng - 1)
                def _():
                    for c in copies(t, t % nbuf):
                        c.start()

        @pl.when(g + nbuf - 1 <= ng - 1)
        def _():
            for c in copies(g + nbuf - 1, jax.lax.rem(g + nbuf - 1, nbuf)):
                c.start()

        for c in copies(g, slot):
            c.wait()
        for i in range(cpg):
            win = slab[slot, i]               # (wrp, wcp) f32, VMEM
            sl = pl.ds(i * chunk, chunk)
            lx = lx_ref[sl, :]                # (chunk, 1) f32 window-local
            ly = ly_ref[sl, :]
            x0 = jnp.floor(lx)
            y0 = jnp.floor(ly)
            wx = lx - x0
            wy = ly - y0
            xi = jnp.clip(x0.astype(jnp.int32), 0, wcp - 2)
            yi = jnp.clip(y0.astype(jnp.int32), 0, wrp - 2)

            riota = jax.lax.broadcasted_iota(jnp.int32, (chunk, wrp), 1)
            mrow = ((riota == yi).astype(jnp.float32) * (1.0 - wy)
                    + (riota == yi + 1).astype(jnp.float32) * wy)
            rows_v = jax.lax.dot(
                mrow, win, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)      # (chunk, wcp)
            ciota = jax.lax.broadcasted_iota(jnp.int32, (chunk, wcp), 1)
            mcol = ((ciota == xi).astype(jnp.float32) * (1.0 - wx)
                    + (ciota == xi + 1).astype(jnp.float32) * wx)
            z_ref[sl, :] = jnp.sum(rows_v * mcol, axis=1, keepdims=True)

    return kernel


def _run(planes, pg, by, bx, lx, ly, *, chunk: int, wrp: int, wcp: int,
         nbuf: int, cpg: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = lx.shape[0]
    nch = n // chunk
    # pad the chunk list to a cpg multiple (repeat the last chunk; its
    # duplicate outputs land past n and are sliced off by the caller)
    rem = (-nch) % cpg
    if rem:
        pg = jnp.concatenate([pg, jnp.broadcast_to(pg[-1], (rem,))])
        by = jnp.concatenate([by, jnp.broadcast_to(by[-1], (rem,))])
        bx = jnp.concatenate([bx, jnp.broadcast_to(bx[-1], (rem,))])
        lx = jnp.concatenate([lx, jnp.tile(lx[-chunk:], (rem, 1))])
        ly = jnp.concatenate([ly, jnp.tile(ly[-chunk:], (rem, 1))])
        nch += rem
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nch // cpg,),
        in_specs=[
            pl.BlockSpec((cpg * chunk, 1), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpg * chunk, 1), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((cpg * chunk, 1), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, cpg, wrp, wcp), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf, cpg)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(chunk, wrp, wcp, nbuf, cpg),
        out_shape=jax.ShapeDtypeStruct((nch * chunk, 1), jnp.float32),
        grid_spec=grid_spec,
    )(pg.astype(jnp.int32), by.astype(jnp.int32), bx.astype(jnp.int32),
      lx.astype(jnp.float32), ly.astype(jnp.float32),
      planes.astype(jnp.float32)).reshape(-1)[: n]


def _window_bases(xc, yc, R, C, Rp, Cp, wrp, wcp):
    """Shared prologue: aligned per-chunk window bases (sublane 8 / lane 128
    DMA alignment), the host-side resolvability mask against those windows
    and the REAL (unpadded) plane bounds, and window-local query coords."""
    dt = xc.dtype
    n = xc.shape[0] * xc.shape[1]
    x0 = jnp.floor(xc).astype(jnp.int32)
    y0 = jnp.floor(yc).astype(jnp.int32)
    bx = jnp.clip((jnp.min(x0, axis=1) // 128) * 128, 0, Cp - wcp)
    by = jnp.clip((jnp.min(y0, axis=1) // 8) * 8, 0, Rp - wrp)
    lx0 = x0 - bx[:, None]
    ly0 = y0 - by[:, None]
    ok = (
        (lx0 >= 0) & (lx0 <= wcp - 2) & (ly0 >= 0) & (ly0 <= wrp - 2)
        & (x0 >= 0) & (x0 <= C - 2) & (y0 >= 0) & (y0 <= R - 2)
    )
    lx = (xc - bx[:, None].astype(dt)).reshape(n, 1)
    ly = (yc - by[:, None].astype(dt)).reshape(n, 1)
    return bx, by, ok, lx, ly


def _pad_planes(planes, wrp: int, wcp: int):
    K, R, C = planes.shape
    Rp = max(_ceil_to(R, 8), wrp)
    Cp = max(_ceil_to(C, 128), wcp)
    if (Rp, Cp) != (R, C):
        planes = jnp.pad(planes, ((0, 0), (0, Rp - R), (0, Cp - C)))
    return planes, Rp, Cp


@partial(jax.jit, static_argnames=("chunk", "wr", "wc", "nbuf", "cpg"))
def pallas_band_resample(plane, x, y, *, chunk: int = 512, wr: int = 48,
                         wc: int = 128, nbuf: int = 2, cpg: int = 4):
    """Chunked windowed bilinear over a NaN-free dense plane, Pallas-fused.

    plane: (R, C) f32 fully-defined band/page values.
    x, y:  (N,) continuous plane-frame coords; N % chunk == 0.
    Returns (z, ok) like ``ops.band._band_resample(masked=False)``.
    """
    R, C = plane.shape
    dt = plane.dtype
    wrp = _ceil_to(wr, 8) + 8
    wcp = _ceil_to(wc, 128) + 128
    planes, Rp, Cp = _pad_planes(plane[None], wrp, wcp)

    n = x.shape[0]
    nch = n // chunk
    xc = x.reshape(nch, chunk).astype(dt)
    yc = y.reshape(nch, chunk).astype(dt)
    bx, by, ok, lx, ly = _window_bases(xc, yc, R, C, Rp, Cp, wrp, wcp)
    ok = ok.reshape(-1)
    z = _run(planes, jnp.zeros((nch,), jnp.int32), by, bx, lx, ly,
             chunk=chunk, wrp=wrp, wcp=wcp, nbuf=nbuf, cpg=cpg)
    return jnp.where(ok, z, jnp.nan).astype(dt), ok


@partial(jax.jit, static_argnames=("chunk", "wr", "wc", "nbuf", "pick", "cpg"))
def pallas_atlas_resample(planes, origins, x, y, *, chunk: int = 512,
                          wr: int = 48, wc: int = 128, nbuf: int = 2,
                          pick: bool = True, cpg: int = 4):
    """K-page twin of ``ops.band._atlas_resample(masked=False)``: each chunk
    is routed to the page containing its bbox center, then resampled with
    the same kernel (the page index is one more prefetch scalar).

    planes:  (K, R, C) NaN-free page values; origins (K, 2) page (row0,col0).
    x, y:    (N,) GRID-frame coords; N % chunk == 0.
    """
    K, R, C = planes.shape
    dt = planes.dtype
    wrp = _ceil_to(wr, 8) + 8
    wcp = _ceil_to(wc, 128) + 128
    planes, Rp, Cp = _pad_planes(planes, wrp, wcp)

    n = x.shape[0]
    nch = n // chunk
    xc = x.reshape(nch, chunk).astype(dt)
    yc = y.reshape(nch, chunk).astype(dt)

    if pick:
        cx = 0.5 * (jnp.min(xc, axis=1) + jnp.max(xc, axis=1))
        cy = 0.5 * (jnp.min(yc, axis=1) + jnp.max(yc, axis=1))
        r0 = origins[:, 0][None, :]
        c0 = origins[:, 1][None, :]
        fits = (
            (cx[:, None] >= c0) & (cx[:, None] <= c0 + (C - 1))
            & (cy[:, None] >= r0) & (cy[:, None] <= r0 + (R - 1))
        )
        any_fit = jnp.any(fits, axis=1)
        page = jnp.argmax(fits, axis=1).astype(jnp.int32)
    else:
        any_fit = jnp.ones((nch,), bool)
        page = jnp.zeros((nch,), jnp.int32)
    org = origins[page]                                  # (nch, 2)
    xb = xc - org[:, 1][:, None]
    yb = yc - org[:, 0][:, None]
    bx, by, ok, lx, ly = _window_bases(xb, yb, R, C, Rp, Cp, wrp, wcp)
    ok = (ok & any_fit[:, None]).reshape(-1)
    z = _run(planes, page, by, bx, lx, ly,
             chunk=chunk, wrp=wrp, wcp=wcp, nbuf=nbuf, cpg=cpg)
    return jnp.where(ok, z, jnp.nan).astype(dt), ok
