"""Chip probe: trajectory-band router vs the packed path (VERDICT r3 item 7).

Workload: bench-sized Kerguelen stand-in (2053x2441, 10% mask), a 5M-sample
AUV survey trajectory confined to a band of rows (dense sampling: consecutive
pings ~0.2 cells apart), served as ordinary kriging.

Measures, steady-state (scalar-checksum sync, utils/timing.py):
  1. packed two-tier transposed kriging on the trajectory batch (the r3
     default path — coherent_probe_r3 showed trajectory batches get NO
     locality benefit, so this equals its random-batch rate);
  2. the band resample alone (serving mode: band filled once, many batches);
  3. band fill cost (one-shot amortization) + end-to-end router rate;
  4. resample parity vs direct bilinear of the band plane, band-vs-exact
     semantic divergence (documented in docs/SEMANTICS.md), and the
     coherence statistic + routing decisions.

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


def main():
    import auvtpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from auvtpu.config import KERGUELEN_EXTENT as EXT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.ops.band import BandRouter
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
    print(f"grid {H}x{W}", flush=True)

    # survey trajectory: monotone lon sweep + sinusoidal cross-track weave
    # inside a ~120-row band; ~0.2-cell ping spacing
    t = np.linspace(0.0, 1.0, N)
    x = 1.0 + t * (W - 3)
    y = H * 0.45 + 55.0 * np.sin(t * 800 * np.pi)
    rng = np.random.default_rng(0)
    x = np.clip(x + rng.normal(0, 0.05, N), 0.5, W - 1.5)
    y = np.clip(y + rng.normal(0, 0.05, N), 0.5, H - 1.5)
    lon = (EXT.min_lon + x * (EXT.max_lon - EXT.min_lon) / (W - 1)).astype(np.float32)
    lat = (EXT.min_lat + y * (EXT.max_lat - EXT.min_lat) / (H - 1)).astype(np.float32)
    lon_d = jnp.asarray(lon)
    lat_d = jnp.asarray(lat)

    # --- 1. packed path on the trajectory ---------------------------------
    tt = TwoTierInterpolator(grid)  # auto -> transposed on TPU
    # escalation census (explains any gap vs the random-batch rate: each
    # unresolved chunk adds a 16k-cap slow-path dispatch + scatter)
    mask, bad = tt._resolved_mask(lon_d, lat_d, 4)
    print(f"two-tier unresolved on trajectory: {int(bad)} / {N}", flush=True)
    ms = steady_state_ms(lambda: tt.kriging(lon_d, lat_d), iters=8, warmup=2)
    packed_rate = N / ms / 1e3
    print(f"packed transposed kriging (trajectory): {ms:8.2f} ms  {packed_rate:7.1f} M pts/s", flush=True)

    # --- 2/3. band router -------------------------------------------------
    router = BandRouter(grid, chunk=CHUNK, win_rows=WR, win_cols=WC)
    frac = router.coherence(lon_d, lat_d)
    print(f"coherence (chunk {CHUNK} fits {WR}x{WC}): {frac:.4f}", flush=True)

    t0 = time.perf_counter()
    band = router.prepare(lon_d, lat_d)
    jax.block_until_ready(band.plane)
    float(jnp.sum(band.plane))  # force readback sync (tunnel)
    fill_cold_s = time.perf_counter() - t0
    print(f"band: rows {band.row0}+{band.shape[0]}, cols {band.col0}+{band.shape[1]} "
          f"({band.cells/1e6:.2f}M cells, masked={band.masked}); "
          f"fill+build cold {fill_cold_s*1e3:.0f} ms", flush=True)
    # serving-mode refresh: same band geometry, no bbox/masked host syncs
    fill_ms = steady_state_ms(
        lambda: router.refresh().plane, iters=4, warmup=1)
    print(f"band refresh steady: {fill_ms:8.2f} ms ({fill_ms*1e6/band.cells:.1f} ns/cell)", flush=True)

    rs = router._resampler
    print(f"resample window: {rs.wr}x{rs.wc} (auto; upper bound {WR}x{WC})", flush=True)
    ms_r = steady_state_ms(lambda: rs.resample(lon_d, lat_d)[0], iters=8, warmup=2)
    res_rate = N / ms_r / 1e3
    print(f"band resample (serving): {ms_r:8.2f} ms  {res_rate:7.1f} M pts/s "
          f"({ms_r*1e6/N:.2f} ns/query)", flush=True)
    one_shot = N / (ms_r + fill_ms) / 1e3
    print(f"band one-shot (fill+resample): {ms_r+fill_ms:8.2f} ms  {one_shot:7.1f} M pts/s", flush=True)

    # --- 4. correctness + semantics ---------------------------------------
    z, ok = rs.resample(lon_d, lat_d)
    okh = np.asarray(ok)
    zh = np.asarray(z)
    print(f"resolved fraction: {okh.mean():.4f}", flush=True)
    sub = slice(0, 200_000)
    xb = x[sub] - band.col0
    yb = y[sub] - band.row0
    p = np.asarray(band.plane, np.float64)
    x0 = np.floor(xb).astype(int); y0 = np.floor(yb).astype(int)
    wx = xb - x0; wy = yb - y0
    want = ((1 - wy) * ((1 - wx) * p[y0, x0] + wx * p[y0, x0 + 1])
            + wy * ((1 - wx) * p[y0 + 1, x0] + wx * p[y0 + 1, x0 + 1]))
    m = okh[sub]
    err = np.abs(zh[sub][m] - want[m])
    print(f"resample parity vs direct bilinear (200k): maxabs={err.max():.3e}", flush=True)

    exact = np.asarray(tt.kriging(lon_d[sub], lat_d[sub]))
    dv = np.abs(zh[sub][m] - exact[m])
    span = float(np.nanmax(reduced) - np.nanmin(reduced))
    print(f"band-vs-exact divergence (200k): MAE={dv.mean():.3f} m  p99={np.quantile(dv,0.99):.3f} m  "
          f"span={span:.0f} m", flush=True)

    # routing decisions
    print(f"route(trajectory, one-shot) = {router.route(lon_d, lat_d)}", flush=True)
    print(f"route(trajectory, band_ready) = {router.route(lon_d, lat_d, band_ready=True)}", flush=True)
    rnd = jax.random.uniform(jax.random.PRNGKey(0), (N,), jnp.float32)
    rlon = EXT.min_lon + 0.02 + rnd * (EXT.max_lon - EXT.min_lon - 0.04)
    rnd2 = jax.random.uniform(jax.random.PRNGKey(1), (N,), jnp.float32)
    rlat = EXT.min_lat + 0.02 + rnd2 * (EXT.max_lat - EXT.min_lat - 0.04)
    print(f"route(random batch) = {router.route(rlon, rlat)}", flush=True)

    print(f"\nSUMMARY: packed {packed_rate:.1f} M pts/s | band serving {res_rate:.1f} "
          f"| band one-shot {one_shot:.1f} M pts/s", flush=True)


if __name__ == "__main__":
    main()
