"""Chip probe: transposed queries-on-lanes resample + auto-sized windows.

results/resample_hilo_r5.txt closed the hi/lo decomposition negative and
named the bound: per-query vector-op count x relayouts, with the wide
layout's wc pinned to the 128-lane register.  The 'hat_t' layout puts
queries on LANES and window columns on SUBLANES, so an auto-sized window
(per-chunk spans on survey trajectories are ~1-15 cells) shrinks per-query
work proportionally — wc can drop 128 -> 8.

Cases (band = weaving lon-sweep, atlas = 8-page diagonal mission, 5M pts):

  hat/wide      shipped default: hat build, (48, 128) window
  hat_t/wide    layout-only control: transposed at the same (48, 128)
  hat_t/auto    transposed at the trajectory's measured (wr, wc)

Parity is gated first (identical resolved masks at covering windows;
values to 1 f32 ulp — the transposed row contraction may pick a different
FMA pairing).  Interleaved medians over ROUNDS so tunnel drift cancels.
Serialize with other chip work (CLAUDE.md).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 5_000_000
CHUNK = 512
ROUNDS = 5


def main():
    import auvtpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from auvtpu.config import KERGUELEN_EXTENT as EXT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.ops.band import (
        AtlasResampler,
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

    def to_ll(x, y):
        lon = (EXT.min_lon + x * (EXT.max_lon - EXT.min_lon) / (W - 1)).astype(np.float32)
        lat = (EXT.min_lat + y * (EXT.max_lat - EXT.min_lat) / (H - 1)).astype(np.float32)
        return jnp.asarray(lon), jnp.asarray(lat)

    xb = np.clip(1.0 + t * (W - 3) + rng.normal(0, 0.05, N), 0.5, W - 1.5)
    yb = np.clip(H * 0.45 + 55.0 * np.sin(t * 800 * np.pi)
                 + rng.normal(0, 0.05, N), 0.5, H - 1.5)
    lon_b, lat_b = to_ll(xb, yb)
    xd = np.clip(1.0 + t * (W - 3) + rng.normal(0, 0.05, N), 0.5, W - 1.5)
    yd = np.clip(1.0 + t * (H - 3) + 55.0 * np.sin(t * 800 * np.pi)
                 + rng.normal(0, 0.05, N), 0.5, H - 1.5)
    lon_d, lat_d = to_ll(xd, yd)

    rb = BandRouter(grid, chunk=CHUNK)
    band = rb.prepare(lon_b, lat_b)
    ra = BandRouter(grid, chunk=CHUNK, max_bands=8)
    atlas = ra.prepare(lon_d, lat_d)
    print(f"band {band.shape} masked={band.masked}; "
          f"atlas {atlas.shape} masked={atlas.masked}", flush=True)

    def auto_wrc(lon, lat, quantum):
        x, y = grid.lonlat_to_xy(lon, lat)
        boxes = _trajectory_boxes(x, y, CHUNK)
        wr = max(8, _ceil_to(int((boxes[:, 3] - boxes[:, 2]).max()) + 2, 8))
        wc = max(quantum, _ceil_to(int((boxes[:, 1] - boxes[:, 0]).max()) + 2, quantum))
        return wr, wc

    wr_b, wc_b = auto_wrc(lon_b, lat_b, 8)
    wr_d, wc_d = auto_wrc(lon_d, lat_d, 8)
    print(f"auto windows: band ({wr_b},{wc_b})  atlas ({wr_d},{wc_d})", flush=True)

    cases = {
        "band/hat/48x128": (
            BandResampler(grid, band, chunk=CHUNK, lerp_mode="hat"), lon_b, lat_b),
        "band/hat_t/48x128": (
            BandResampler(grid, band, chunk=CHUNK, lerp_mode="hat_t"), lon_b, lat_b),
        f"band/hat_t/{wr_b}x{wc_b}": (
            BandResampler(grid, band, chunk=CHUNK, win_rows=wr_b, win_cols=wc_b,
                          lerp_mode="hat_t"), lon_b, lat_b),
        "atlas/hat/48x128": (
            AtlasResampler(grid, atlas, chunk=CHUNK, lerp_mode="hat"), lon_d, lat_d),
        "atlas/hat_t/48x128": (
            AtlasResampler(grid, atlas, chunk=CHUNK, lerp_mode="hat_t"), lon_d, lat_d),
        f"atlas/hat_t/{wr_d}x{wc_d}": (
            AtlasResampler(grid, atlas, chunk=CHUNK, win_rows=wr_d, win_cols=wc_d,
                          lerp_mode="hat_t"), lon_d, lat_d),
    }

    # parity gate on chip
    outs = {}
    for name, (rs, lon, lat) in cases.items():
        z, ok = rs.resample(lon, lat)
        outs[name] = (np.asarray(z), np.asarray(ok))
        print(f"{name}: resolved {outs[name][1].mean():.4f}", flush=True)
    for w, base in (("band", "band/hat/48x128"), ("atlas", "atlas/hat/48x128")):
        z0, ok0 = outs[base]
        for name in cases:
            if name == base or not name.startswith(w):
                continue
            zm, okm = outs[name]
            assert (okm == ok0).all(), (name, "resolved-mask mismatch")
            dv = np.abs(zm[ok0] - z0[ok0])
            rel = dv / np.maximum(np.abs(z0[ok0]), 1.0)
            print(f"{name}: parity maxabs={dv.max():.3e} maxrel={rel.max():.3e}",
                  flush=True)
            assert rel.max() < 1e-6, (name, rel.max())

    times = {name: [] for name in cases}
    for r in range(ROUNDS):
        for name, (rs, lon, lat) in cases.items():
            times[name].append(
                steady_state_ms(lambda: rs.resample(lon, lat)[0],
                                iters=6, warmup=1))
        print(f"round {r}: " + "  ".join(
            f"{name}={v[-1]:.2f}" for name, v in times.items()), flush=True)

    print("\nmedians:", flush=True)
    for name, v in times.items():
        med = float(np.median(v))
        print(f"  {name:22s} {med:8.2f} ms  {N/med/1e3:7.1f} M pts/s",
              flush=True)


if __name__ == "__main__":
    main()
