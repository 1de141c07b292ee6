"""Chip probe: chunk-size sweep for the transposed (hat_t) resample.

resample_breakdown_r5.txt named the c512 bound: the vmapped dynamic_slice
window extraction (~15 of 22 ms) — per-chunk slice count, not per-query
math.  Larger chunks amortize it: c1024 336.8, c2048 366.7 M pts/s on the
band weave.  This sweep extends to c4096/c8192 (auto wr grows with the
chunk's row span, so extraction elements plateau while slice count keeps
falling) and covers the 8-page diagonal atlas, to pick serving defaults.

Parity-gated vs the shipped default first; interleaved medians over ROUNDS.
Serialize with other chip work (CLAUDE.md).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 5_000_000
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

    rb = BandRouter(grid, chunk=512)
    band = rb.prepare(lon_b, lat_b)
    ra = BandRouter(grid, chunk=512, max_bands=8)
    atlas = ra.prepare(lon_d, lat_d)
    print(f"band {band.shape} masked={band.masked}; "
          f"atlas {atlas.shape} masked={atlas.masked}", flush=True)

    def auto_wrc(lon, lat, band_like, chunk):
        x, y = grid.lonlat_to_xy(lon, lat)
        boxes = _trajectory_boxes(x, y, chunk)
        wr = max(8, _ceil_to(int((boxes[:, 3] - boxes[:, 2]).max()) + 2, 8))
        wc = max(8, _ceil_to(int((boxes[:, 1] - boxes[:, 0]).max()) + 2, 8))
        R, C = band_like.shape[-2], band_like.shape[-1]
        return min(wr, R), min(wc, C)

    cases = {}
    checks = {}
    for chunk in (1024, 2048, 4096, 8192):
        wr, wc = auto_wrc(lon_b, lat_b, band, chunk)
        rs = BandResampler(grid, band, chunk=chunk, win_rows=wr, win_cols=wc,
                           lerp_mode="hat_t")
        cases[f"band/c{chunk}/{wr}x{wc}"] = (rs, lon_b, lat_b)
        checks[f"band/c{chunk}/{wr}x{wc}"] = ("band", rs)
    for chunk in (512, 1024, 2048, 4096):
        wr, wc = auto_wrc(lon_d, lat_d, atlas, chunk)
        rs = AtlasResampler(grid, atlas, chunk=chunk, win_rows=wr, win_cols=wc,
                            lerp_mode="hat_t")
        cases[f"atlas/c{chunk}/{wr}x{wc}"] = (rs, lon_d, lat_d)
        checks[f"atlas/c{chunk}/{wr}x{wc}"] = ("atlas", rs)

    # parity gates vs the shipped defaults
    refs = {
        "band": (BandResampler(grid, band, chunk=512), lon_b, lat_b),
        "atlas": (AtlasResampler(grid, atlas, chunk=512), lon_d, lat_d),
    }
    base = {}
    for w, (rs, lon, lat) in refs.items():
        z, ok = (np.asarray(a) for a in rs.resample(lon, lat))
        base[w] = (z, ok)
        print(f"{w}/ref: resolved {ok.mean():.4f}", flush=True)
    for name, (w, rs) in checks.items():
        lon, lat = cases[name][1], cases[name][2]
        z, ok = (np.asarray(a) for a in rs.resample(lon, lat))
        z0, ok0 = base[w]
        both = ok0 & ok
        assert both.mean() > 0.90, (name, both.mean(), ok.mean())
        rel = np.abs(z[both] - z0[both]) / np.maximum(np.abs(z0[both]), 1.0)
        print(f"{name}: resolved {ok.mean():.4f} parity maxrel={rel.max():.3e}",
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
