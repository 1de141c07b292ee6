"""Chip probe: segmented band ATLAS vs single bbox band vs packed path.

Workload: bench-sized Kerguelen stand-in (2053x2441, 10% mask), a 5M-sample
DIAGONAL survey crossing the whole grid (thin weaving corridor, ~0.2-cell
ping spacing).  This is the single-band router's worst case: the bbox band
degenerates to (nearly) the whole grid, so its fill cost is maximal, while
the corridor itself covers a small fraction of those cells.

Measures, steady-state (scalar-checksum sync, utils/timing.py):
  1. packed two-tier transposed kriging on the diagonal batch (baseline);
  2. single-band router (max_bands=1): fill cost (~whole grid) + serving;
  3. atlas router (max_bands=8): plan_segments cost, page fill cost,
     serving resample rate, one-shot rate;
  4. parity (atlas vs single-band resample on resolved queries, both are
     crops of the same dense fill) + routing decisions at both settings.

Serialize with other chip work (CLAUDE.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 5_000_000
CHUNK = 512
WR, WC = 48, 128
MAX_BANDS = 8


def main():
    import auvtpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from auvtpu.config import KERGUELEN_EXTENT as EXT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.ops.band import BandRouter, plan_segments
    from auvtpu.ops.two_tier import TwoTierInterpolator
    from auvtpu.synthetic import kerguelen_standin
    from auvtpu.utils.device import wait_for_device
    from auvtpu.utils.timing import steady_state_ms

    wait_for_device()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    elev = kerguelen_standin()
    reduced, rc, truth = mask_grid(elev, 0.10)
    H, W = reduced.shape
    grid = RegularGrid.from_nan_array(np.asarray(reduced, np.float32), EXT)
    print(f"grid {H}x{W} ({H*W/1e6:.2f}M cells)", flush=True)

    # diagonal survey: corner-to-corner sweep + sinusoidal cross-track weave
    t = np.linspace(0.0, 1.0, N)
    x = 1.0 + t * (W - 3)
    y = 1.0 + t * (H - 3) + 55.0 * np.sin(t * 800 * np.pi)
    rng = np.random.default_rng(0)
    x = np.clip(x + rng.normal(0, 0.05, N), 0.5, W - 1.5)
    y = np.clip(y + rng.normal(0, 0.05, N), 0.5, H - 1.5)
    lon = (EXT.min_lon + x * (EXT.max_lon - EXT.min_lon) / (W - 1)).astype(np.float32)
    lat = (EXT.min_lat + y * (EXT.max_lat - EXT.min_lat) / (H - 1)).astype(np.float32)
    lon_d = jnp.asarray(lon)
    lat_d = jnp.asarray(lat)

    # --- 1. packed path on the diagonal ------------------------------------
    tt = TwoTierInterpolator(grid)
    mask, bad = tt._resolved_mask(lon_d, lat_d, 4)
    print(f"two-tier unresolved on diagonal: {int(bad)} / {N}", flush=True)
    ms = steady_state_ms(lambda: tt.kriging(lon_d, lat_d), iters=8, warmup=2)
    packed_rate = N / ms / 1e3
    print(f"packed transposed kriging (diagonal): {ms:8.2f} ms  "
          f"{packed_rate:7.1f} M pts/s", flush=True)

    # --- 2. single bbox band (worst case) ----------------------------------
    router1 = BandRouter(grid, chunk=CHUNK, win_rows=WR, win_cols=WC,
                         two_tier=tt)
    r0, nr, c0, nc = router1.band_bbox(lon_d, lat_d)
    print(f"single-band bbox: rows {r0}+{nr}, cols {c0}+{nc} "
          f"({nr*nc/1e6:.2f}M cells = {nr*nc/(H*W)*100:.0f}% of grid)", flush=True)
    t0 = time.perf_counter()
    band = router1.prepare(lon_d, lat_d)
    jax.block_until_ready(band.plane)
    float(jnp.sum(band.plane))
    print(f"single-band fill+build cold: {(time.perf_counter()-t0)*1e3:.0f} ms",
          flush=True)
    fill1_ms = steady_state_ms(lambda: router1.refresh().plane, iters=4, warmup=1)
    print(f"single-band refresh steady: {fill1_ms:8.2f} ms "
          f"({fill1_ms*1e6/band.cells:.2f} ns/cell)", flush=True)
    ms1 = steady_state_ms(
        lambda: router1._resampler.resample(lon_d, lat_d)[0], iters=8, warmup=2)
    rate1 = N / ms1 / 1e3
    one1 = N / (ms1 + fill1_ms) / 1e3
    print(f"single-band resample: {ms1:8.2f} ms  {rate1:7.1f} M pts/s; "
          f"one-shot {one1:7.1f} M pts/s", flush=True)
    z1, ok1 = router1._resampler.resample(lon_d, lat_d)

    # --- 3. atlas router ----------------------------------------------------
    t0 = time.perf_counter()
    segs = plan_segments(x, y, chunk=CHUNK, max_bands=MAX_BANDS,
                         grid_shape=grid.shape)
    plan_ms = (time.perf_counter() - t0) * 1e3
    # device path (what router.prepare/route actually use): bbox reduction on
    # chip, (nch,4) readback
    xd, yd = grid.lonlat_to_xy(lon_d, lat_d)
    plan_segments(xd, yd, chunk=CHUNK, max_bands=MAX_BANDS,
                  grid_shape=grid.shape)  # compile
    t0 = time.perf_counter()
    segs_d = plan_segments(xd, yd, chunk=CHUNK, max_bands=MAX_BANDS,
                           grid_shape=grid.shape)
    plan_dev_ms = (time.perf_counter() - t0) * 1e3
    print(f"plan_segments device-boxes path: {plan_dev_ms:.0f} ms "
          f"(host-numpy path: {plan_ms:.0f} ms); same plan: {segs_d == segs}",
          flush=True)
    pr = max(s[2] for s in segs)
    pc = max(s[3] for s in segs)
    print(f"plan_segments: {len(segs)} pages, common shape {pr}x{pc}, "
          f"total {len(segs)*pr*pc/1e6:.2f}M cells "
          f"({len(segs)*pr*pc/(nr*nc)*100:.0f}% of the bbox band); "
          f"planning {plan_ms:.0f} ms host", flush=True)

    router = BandRouter(grid, chunk=CHUNK, win_rows=WR, win_cols=WC,
                        max_bands=MAX_BANDS, two_tier=tt)
    t0 = time.perf_counter()
    atlas = router.prepare(lon_d, lat_d)
    jax.block_until_ready(atlas.planes)
    float(jnp.sum(atlas.planes))
    print(f"atlas fill+build cold: {(time.perf_counter()-t0)*1e3:.0f} ms "
          f"(masked={atlas.masked})", flush=True)
    fillA_ms = steady_state_ms(lambda: router.refresh().planes, iters=4, warmup=1)
    print(f"atlas refresh steady: {fillA_ms:8.2f} ms "
          f"({fillA_ms*1e6/atlas.cells:.2f} ns/cell)", flush=True)
    print(f"atlas resample window: {router._resampler.wr}x{router._resampler.wc} "
          f"(auto; upper bound {WR}x{WC})", flush=True)
    msA = steady_state_ms(
        lambda: router._resampler.resample(lon_d, lat_d)[0], iters=8, warmup=2)
    rateA = N / msA / 1e3
    oneA = N / (msA + fillA_ms) / 1e3
    print(f"atlas resample (serving): {msA:8.2f} ms  {rateA:7.1f} M pts/s "
          f"({msA*1e6/N:.2f} ns/query); one-shot {oneA:7.1f} M pts/s", flush=True)

    # --- 4. parity + routing ------------------------------------------------
    zA, okA = router._resampler.resample(lon_d, lat_d)
    okAh = np.asarray(okA)
    ok1h = np.asarray(ok1)
    both = okAh & ok1h
    print(f"resolved fraction: atlas {okAh.mean():.4f}, single-band "
          f"{ok1h.mean():.4f}", flush=True)
    dv = np.abs(np.asarray(zA)[both] - np.asarray(z1)[both])
    print(f"atlas-vs-single-band parity (resolved-by-both): "
          f"maxabs={dv.max():.3e}", flush=True)
    zfull = np.asarray(router.kriging(lon_d, lat_d, force="band"))
    print(f"router.kriging finite: {np.isfinite(zfull).all()}", flush=True)

    print(f"route(diagonal, max_bands=1) = {router1.route(lon_d, lat_d)}",
          flush=True)
    print(f"route(diagonal, max_bands={MAX_BANDS}) = {router.route(lon_d, lat_d)}",
          flush=True)
    print(f"route(diagonal, atlas ready) = "
          f"{router.route(lon_d, lat_d, band_ready=True)}", flush=True)

    print(f"\nSUMMARY: packed {packed_rate:.1f} | single-band one-shot {one1:.1f} "
          f"(serving {rate1:.1f}) | atlas one-shot {oneA:.1f} "
          f"(serving {rateA:.1f}) M pts/s", flush=True)


if __name__ == "__main__":
    main()
