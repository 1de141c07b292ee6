"""Real-time AUV swath streaming demo.

The reference is a batch study, but its title workload — "real-time
interpolation for AUV bathymetry mapping" — is a vehicle flying a lawnmower
survey while sonar swaths arrive and the local map must stay filled.  This
demo drives :class:`auvtpu.streaming.StreamingInterpolator` through exactly
that loop and reports the real-time budget:

1. synthesize a truth seabed (shelf+seamount) over the survey extent;
2. fly a lawnmower track; each step emits one across-track swath of noisy
   depth soundings (beam count, spacing and noise are flags);
3. ``ingest`` each swath (host-staged; one packed device transfer per
   flush), and every ``fill_every`` steps pull the interpolated local map
   around the vehicle (``window_fill``);
4. at the end, score the filled mosaic against the truth over the surveyed
   corridor and print ingest/fill throughput.

Run: ``python -m auvtpu.cli.stream_demo --steps 400``
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from ..config import Extent
from ..streaming import StreamingInterpolator
from ..synthetic import shelf_seamount


def log(*a):
    print(*a, flush=True)


def lawnmower_track(H, W, n_steps, line_spacing):
    """(n_steps, 2) row/col vehicle positions covering a lawnmower survey."""
    rows, cols = [], []
    n_lines = max(1, (H - 40) // line_spacing)
    steps_per_line = max(1, n_steps // max(n_lines, 1))
    r = 20
    for line in range(n_lines):
        cs = np.linspace(20, W - 20, steps_per_line)
        if line % 2:
            cs = cs[::-1]
        rows.extend([r] * steps_per_line)
        cols.extend(cs)
        r += line_spacing
        if len(rows) >= n_steps:
            break
    rows = np.asarray(rows[:n_steps], np.float64)
    cols = np.asarray(cols[:n_steps], np.float64)
    if len(rows) < n_steps:  # rounding shortfall: hold station at the end
        pad = n_steps - len(rows)
        rows = np.concatenate([rows, np.full(pad, rows[-1])])
        cols = np.concatenate([cols, np.full(pad, cols[-1])])
    return rows, cols


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mosaic", type=int, nargs=2, default=[1024, 1024],
                   metavar=("H", "W"), help="mosaic shape (cells)")
    p.add_argument("--steps", type=int, default=400, help="track steps (pings)")
    p.add_argument("--beams", type=int, default=256, help="soundings per swath")
    p.add_argument("--swath-width", type=float, default=60.0,
                   help="across-track swath width (cells)")
    p.add_argument("--line-spacing", type=int, default=40,
                   help="lawnmower line spacing (cells)")
    p.add_argument("--noise", type=float, default=0.5, help="sounding noise (m)")
    p.add_argument("--fill-every", type=int, default=10,
                   help="window_fill cadence (steps)")
    p.add_argument("--window", type=int, default=256, help="local map size")
    p.add_argument("--method", default="idw", choices=["idw", "mean", "kriging"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out-npy", default=None, help="write final mosaic (npy)")
    p.add_argument(
        "--uncertainty", action="store_true",
        help="at the end: fit the variogram from the mosaic and report the "
        "kriging prediction-variance map around the vehicle (the 'survey "
        "here next' surface)",
    )
    p.add_argument(
        "--shard", type=int, default=1, metavar="N",
        help="run the mosaic row-band-sharded over an N-device mesh "
        "(parallel.streaming.ShardedStreamingInterpolator) — the scale-out "
        "path for mosaics larger than one chip's HBM; same results bit for "
        "bit.  Needs N visible devices (e.g. JAX_PLATFORMS=cpu XLA_FLAGS="
        "--xla_force_host_platform_device_count=N for a virtual mesh)",
    )
    p.add_argument(
        "--shard2d", type=int, nargs=2, default=None, metavar=("NY", "NX"),
        help="run the mosaic 2-D block-sharded over an (NY, NX) mesh "
        "(parallel.streaming.ShardedStreamingInterpolator2D) — for mosaics "
        "too WIDE for row bands; same results bit for bit",
    )
    args = p.parse_args(argv)

    H, W = args.mosaic
    rng = np.random.default_rng(args.seed)
    truth = shelf_seamount(H, W)
    ext = Extent(0.0, float(W - 1), 0.0, float(H - 1))
    if args.shard2d is not None:
        from ..parallel import ShardedStreamingInterpolator2D, make_mesh2d

        ny, nx = args.shard2d
        si = ShardedStreamingInterpolator2D(
            (H, W), ext, make_mesh2d((ny, nx)),
            window=(args.window, args.window), method=args.method,
            max_radius=5,
        )
        log(f"mosaic 2-D block-sharded over a ({ny}, {nx}) mesh")
    elif args.shard > 1:
        from ..parallel import ShardedStreamingInterpolator, make_mesh

        si = ShardedStreamingInterpolator(
            (H, W), ext, make_mesh(args.shard),
            window=(args.window, args.window), method=args.method,
            max_radius=5,
        )
        log(f"mosaic row-band-sharded over {args.shard} devices")
    else:
        si = StreamingInterpolator(
            (H, W), ext, window=(args.window, args.window), method=args.method,
            max_radius=5,
        )

    vr, vc = lawnmower_track(H, W, args.steps, args.line_spacing)
    # across-track beam offsets (perpendicular to the along-row track)
    beam_off = np.linspace(-args.swath_width / 2, args.swath_width / 2, args.beams)

    t_ingest = 0.0
    t_fill = 0.0
    n_obs = 0
    n_fills = 0
    for s in range(args.steps):
        rows = np.clip(vr[s] + beam_off + rng.normal(0, 0.3, args.beams), 0, H - 1)
        cols = np.clip(np.full(args.beams, vc[s]) + rng.normal(0, 0.3, args.beams), 0, W - 1)
        ri = rows.astype(np.int64)
        ci = cols.astype(np.int64)
        depths = truth[ri, ci] + rng.normal(0, args.noise, args.beams)
        t0 = time.perf_counter()
        si.ingest(ri, ci, depths.astype(np.float32))
        t_ingest += time.perf_counter() - t0
        n_obs += args.beams
        if (s + 1) % args.fill_every == 0:
            t0 = time.perf_counter()
            tile, _ = si.window_fill(int(vr[s]), int(vc[s]))
            np.asarray(tile)  # realize (the vehicle console would render it)
            t_fill += time.perf_counter() - t0
            n_fills += 1

    # score over the surveyed corridor (cells within the swath of any line)
    snap = si.snapshot()
    observed = ~np.isnan(snap)
    # final full-coverage check around the last window
    err = snap[observed] - truth[observed]
    rmse = float(np.sqrt(np.mean(err * err)))
    span = float(truth.max() - truth.min())

    log(f"track steps          : {args.steps} ({n_obs} soundings)")
    log(f"observed cells       : {observed.sum()} ({100*observed.mean():.1f}% of mosaic)")
    log(f"ingest               : {1e3*t_ingest/args.steps:.3f} ms/swath "
        f"({n_obs/max(t_ingest,1e-9)/1e6:.2f} M obs/s incl. staged flushes)")
    if n_fills:
        log(f"window_fill ({args.window}x{args.window}) : {1e3*t_fill/n_fills:.1f} ms/refresh "
            f"({n_fills} refreshes)")
    log(f"mosaic RMSE at observed cells: {rmse:.3f} m ({100*rmse/span:.2f}% of range; "
        f"sounding noise {args.noise} m)")
    if args.uncertainty:
        vp = si.fit_variogram()
        vmap_, _ = si.window_uncertainty(int(vr[-1]), int(vc[-1]))
        vmap_ = np.asarray(vmap_)
        gaps = np.isfinite(vmap_) & (vmap_ > 0)
        log(
            f"fitted variogram (nugget, sill, range): "
            + " ".join(f"{float(v):.4g}" for v in vp)
        )
        if gaps.any():
            sig = np.sqrt(vmap_[gaps])
            log(
                f"uncertainty around vehicle: mean sigma {sig.mean():.2f} m, "
                f"max sigma {sig.max():.2f} m over {gaps.sum()} unsurveyed cells"
            )
        if args.out_npy:
            np.save(args.out_npy + ".var.npy", vmap_)
    if args.out_npy:
        np.save(args.out_npy, snap)
        log(f"mosaic -> {args.out_npy}")
    return rmse, span


if __name__ == "__main__":
    main()
