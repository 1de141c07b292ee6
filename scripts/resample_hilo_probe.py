"""Chip probe: resample one-hot decomposition variants (VERDICT r4 item 2).

results/resample_probe_r4.txt established the band/atlas resample is bound
by per-query one-hot VPU work (~170 M pts/s serving).  The untested lead was
a two-level hi/lo column decomposition.  This probe measures three lerp
builds, interleaved-median over ROUNDS so tunnel drift cancels:

  onehot  the shipped build (two iota compares per weight vector)
  hat     relu(1 - |(iota - i0) - frac|): 5 VPU ops/lane vs 7, weights
          bit-identical (ops/band.py::_lerp_hat)
  hat2    hi/lo: a 7-lane block one-hot picks the 32-wide column slab, then
          one 32-lane hat reduce replaces the flat 128-lane column stage

Parity is gated first (hat bit-identical; hat2 allclose 1e-3 — summation
regrouping).  Serialize with other chip work (CLAUDE.md).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 5_000_000
CHUNK = 512
ROUNDS = 5
MODES = ("onehot", "hat", "hat2")


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
    for mode in MODES:
        cases[f"band/{mode}"] = (
            BandResampler(grid, band, chunk=CHUNK, lerp_mode=mode),
            lon_b, lat_b)
        cases[f"atlas/{mode}"] = (
            AtlasResampler(grid, atlas, chunk=CHUNK, lerp_mode=mode),
            lon_d, lat_d)

    # parity gate on chip
    outs = {}
    for name, (rs, lon, lat) in cases.items():
        z, ok = rs.resample(lon, lat)
        outs[name] = (np.asarray(z), np.asarray(ok))
        print(f"{name}: resolved {outs[name][1].mean():.4f}", flush=True)
    for w in ("band", "atlas"):
        z0, ok0 = outs[f"{w}/onehot"]
        for mode in ("hat", "hat2"):
            zm, okm = outs[f"{w}/{mode}"]
            assert (okm == ok0).all(), (w, mode)
            both = ok0 & okm
            dv = np.abs(zm[both] - z0[both]).max()
            print(f"{w}/{mode}: parity maxabs={dv:.3e}", flush=True)
            assert dv == 0.0 if mode == "hat" else dv < 1e-3, (w, mode, dv)

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
