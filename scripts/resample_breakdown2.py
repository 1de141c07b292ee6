"""Chip probe: per-stage breakdown of the hat_t resample AT THE NEW c2048 DEFAULT.

resample_chunk_sweep_r5.txt flipped the serving defaults to hat_t + auto
windows + chunk=2048 (band 335.7 / atlas 342.3 M pts/s).  The c512
breakdown (resample_breakdown_r5.txt) named the old bound — per-chunk
dynamic-slice extraction count (19.2 of 22.1 ms).  This probe re-runs the
same stage decomposition at c2048/64x8 to name the NEW bound:

  coord    per-query coordinate prep through the `ok` mask
  extract  + vmapped dynamic_slice window extraction
  rows     + mrow hat build + transposed row-contraction einsum
  full     production _band_resample (adds mcol build + column reduce)

If extraction still dominates, the next lead is span-adaptive chunking
(split chunks on row span, not query count).  If per-query math now
dominates, the formulation is converged (~2.7 ns/pt floor).  Stage bodies
mirror ops/band.py::_band_resample/_lerp_window_t; the full case is the
production call, parity-gated first.  Interleaved medians over ROUNDS.
Serialize with other chip work (CLAUDE.md).
"""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 5_000_000
ROUNDS = 5
CHUNK = 2048


def main():
    import auvtpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from auvtpu.config import KERGUELEN_EXTENT as EXT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.ops.band import (
        BandResampler,
        BandRouter,
        _ceil_to,
        _trajectory_boxes,
    )
    from auvtpu.synthetic import kerguelen_standin
    from auvtpu.utils.device import wait_for_device
    from auvtpu.utils.timing import steady_state_ms

    wait_for_device()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    elev = kerguelen_standin()
    reduced, _, _ = mask_grid(elev, 0.10)
    H, W = reduced.shape
    grid = RegularGrid.from_nan_array(np.asarray(reduced, np.float32), EXT)

    t = np.linspace(0.0, 1.0, N)
    rng = np.random.default_rng(0)
    xb = np.clip(1.0 + t * (W - 3) + rng.normal(0, 0.05, N), 0.5, W - 1.5)
    yb = np.clip(H * 0.45 + 55.0 * np.sin(t * 800 * np.pi)
                 + rng.normal(0, 0.05, N), 0.5, H - 1.5)
    lon = jnp.asarray((EXT.min_lon + xb * (EXT.max_lon - EXT.min_lon) / (W - 1)).astype(np.float32))
    lat = jnp.asarray((EXT.min_lat + yb * (EXT.max_lat - EXT.min_lat) / (H - 1)).astype(np.float32))

    rb = BandRouter(grid)
    band = rb.prepare(lon, lat)
    print(f"band {band.shape} masked={band.masked}", flush=True)
    plane = band.plane
    R, C = plane.shape

    gx, gy = grid.lonlat_to_xy(lon, lat)
    gx = gx - band.col0
    gy = gy - band.row0

    def auto_wrc(chunk):
        boxes = _trajectory_boxes(gx, gy, chunk)
        wr = max(8, _ceil_to(int((boxes[:, 3] - boxes[:, 2]).max()) + 2, 8))
        wc = max(8, _ceil_to(int((boxes[:, 1] - boxes[:, 0]).max()) + 2, 8))
        return min(wr, R), min(wc, C)

    # ---- stage kernels (mirror _band_resample + _lerp_window_t) ----

    def coord_prep(x, y, chunk, wr, wc):
        nch = x.shape[0] // chunk
        xc = x.reshape(nch, chunk)
        yc = y.reshape(nch, chunk)
        x0 = jnp.floor(xc).astype(jnp.int32)
        y0 = jnp.floor(yc).astype(jnp.int32)
        wx = (xc - x0).astype(plane.dtype)
        wy = (yc - y0).astype(plane.dtype)
        bx = jnp.clip(jnp.min(x0, axis=1), 0, max(C - wc, 0))
        by = jnp.clip(jnp.min(y0, axis=1), 0, max(R - wr, 0))
        lx0 = x0 - bx[:, None]
        ly0 = y0 - by[:, None]
        ok = ((lx0 >= 0) & (lx0 <= wc - 2) & (ly0 >= 0) & (ly0 <= wr - 2)
              & (x0 >= 0) & (x0 <= C - 2) & (y0 >= 0) & (y0 <= R - 2))
        lx0c = jnp.clip(lx0, 0, wc - 2)
        ly0c = jnp.clip(ly0, 0, wr - 2)
        return xc, yc, wx, wy, bx, by, lx0c, ly0c, ok

    def extract(x, y, chunk, wr, wc):
        out = coord_prep(x, y, chunk, wr, wc)
        bx, by = out[4], out[5]
        win = jax.vmap(
            lambda byi, bxi: jax.lax.dynamic_slice(plane, (byi, bxi), (wr, wc))
        )(by, bx)
        return win, out

    @partial(jax.jit, static_argnames=("chunk", "wr", "wc"))
    def s_coord(x, y, *, chunk, wr, wc):
        _, _, wx, wy, _, _, lx0c, ly0c, ok = coord_prep(x, y, chunk, wr, wc)
        return (wx.sum() + wy.sum()
                + (lx0c + ly0c).sum().astype(plane.dtype)
                + ok.sum().astype(plane.dtype))

    @partial(jax.jit, static_argnames=("chunk", "wr", "wc"))
    def s_extract(x, y, *, chunk, wr, wc):
        win, out = extract(x, y, chunk, wr, wc)
        return win.sum() + out[2].sum() + out[3].sum()

    @partial(jax.jit, static_argnames=("chunk", "wr", "wc"))
    def s_rows(x, y, *, chunk, wr, wc):
        win, out = extract(x, y, chunk, wr, wc)
        _, _, wx, wy, _, _, lx0c, ly0c, ok = out
        riota = jax.lax.broadcasted_iota(jnp.int32, (1, wr, 1), 1)
        dr = (riota - ly0c[:, None, :]).astype(plane.dtype) - wy[:, None, :]
        mrow = jnp.maximum(1 - jnp.abs(dr), 0)
        rows_t = jnp.einsum("nrw,nrc->nwc", win, mrow,
                            precision=jax.lax.Precision.HIGHEST)
        return rows_t.sum() + wx.sum() + ok.sum().astype(plane.dtype)

    def pad_to(x, chunk):
        pad = (-x.shape[0]) % chunk
        if pad:
            x = jnp.concatenate([x, jnp.broadcast_to(x[-1], (pad,))])
        return x

    # ---- cases: stages at the shipped default geometry ----
    wr, wc = auto_wrc(CHUNK)
    rs = BandResampler(grid, band, chunk=CHUNK, win_rows=wr, win_cols=wc,
                       lerp_mode="hat_t")
    cases = {f"full/c{CHUNK}/{wr}x{wc}": (lambda: rs.resample(lon, lat)[0])}
    xp, yp = pad_to(gx, CHUNK), pad_to(gy, CHUNK)
    for nm, fn in (("coord", s_coord), ("extract", s_extract),
                   ("rows", s_rows)):
        cases[f"{nm}/c{CHUNK}/{wr}x{wc}"] = (
            lambda fn=fn: fn(xp, yp, chunk=CHUNK, wr=wr, wc=wc))

    # parity gate vs a c512 wide-layout control
    ref = BandResampler(grid, band, chunk=512, win_rows=48, win_cols=128,
                        lerp_mode="hat")
    z0, ok0 = (np.asarray(a) for a in ref.resample(lon, lat))
    z, ok = (np.asarray(a) for a in rs.resample(lon, lat))
    both = ok0 & ok
    assert both.mean() > 0.95, both.mean()
    rel = np.abs(z[both] - z0[both]) / np.maximum(np.abs(z0[both]), 1.0)
    print(f"parity vs wide c512: resolved {ok.mean():.4f} maxrel={rel.max():.3e}",
          flush=True)
    assert rel.max() < 1e-6, rel.max()

    times = {name: [] for name in cases}
    for r in range(ROUNDS):
        for name, fn in cases.items():
            times[name].append(steady_state_ms(fn, iters=6, warmup=1))
        print(f"round {r}: " + "  ".join(
            f"{name}={v[-1]:.2f}" for name, v in times.items()), flush=True)

    print("\nmedians:", flush=True)
    for name, v in times.items():
        med = float(np.median(v))
        print(f"  {name:24s} {med:8.2f} ms  {N/med/1e3:7.1f} M pts/s",
              flush=True)


if __name__ == "__main__":
    main()
