"""Chip probe: VMEM-fused Pallas resample vs the XLA resample (A/B medians).

Workloads (the band/atlas probe geometries on the bench-sized Kerguelen
stand-in, 5M queries): (a) band-confined trajectory over the 120-row band,
(b) diagonal mission over the 8-page atlas.  Both paths are timed
round-robin for R rounds so tunnel drift cancels; parity is checked on chip
first (Mosaic legality gate — if the kernel fails to compile, this probe
dies loudly before recording anything).

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
    from auvtpu.ops.band import AtlasResampler, BandResampler, BandRouter
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

    cases = {}
    for backend in ("xla", "pallas"):
        cases[f"band/{backend}"] = (
            BandResampler(grid, band, chunk=CHUNK, backend=backend),
            lon_b, lat_b)
        cases[f"atlas/{backend}"] = (
            AtlasResampler(grid, atlas, chunk=CHUNK, backend=backend),
            lon_d, lat_d)

    # parity gate on chip (also the Mosaic-legality check)
    outs = {}
    for name, (rs, lon, lat) in cases.items():
        z, ok = rs.resample(lon, lat)
        outs[name] = (np.asarray(z), np.asarray(ok))
        print(f"{name}: resolved {outs[name][1].mean():.4f}", flush=True)
    for w in ("band", "atlas"):
        (zx, okx), (zp, okp) = outs[f"{w}/xla"], outs[f"{w}/pallas"]
        assert (okp.astype(int) >= okx.astype(int)).all(), w
        both = okx & okp
        dv = np.abs(zp[both] - zx[both]).max()
        print(f"{w}: pallas-vs-xla parity maxabs={dv:.3e} "
              f"(pallas resolves +{int(okp.sum() - okx.sum())})", flush=True)
        assert dv < 1e-3, (w, dv)

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
        print(f"  {name:14s} {med:8.2f} ms  {N/med/1e3:7.1f} M pts/s",
              flush=True)


if __name__ == "__main__":
    main()
