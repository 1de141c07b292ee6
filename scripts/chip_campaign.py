"""Chip results campaign: refresh the committed results CSVs on hardware.

Runs, SERIALLY on the real chip (CLAUDE.md: one chip process at a time):
1. Grid B per region x removal, all methods, reference + centered +
   fitted-gaussian variogram + bit-exact selection rows
   -> results/TestingResults_gridB.csv;
2. Grid A batch sweep (backend per --backend-a)
   -> results/TestingResults_gridA.csv;
3. the scattered-prototype AIDW-vs-IDW measurement on a variable-density
   (survey-strip) sampling of the US-East tile -> the Grid B CSV (GridType=P);
4. figure regeneration (runtime curves, accuracy bars, variogram zoo).

The writers are append-only; pass --fresh to rebuild the CSVs from zero
(required after a timing-semantics change, e.g. the round-3 warm
EndToEndTime fix — stale columns must not mix with honest ones).

Usage: python scripts/chip_campaign.py [--quick] [--fresh]
  --quick: one region / two batch sizes (smoke the pipeline first).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REGIONS = [("mid_atlantic", "0.01"), ("east_pacific", "0.01"), ("mariana", "0.05")]
BATCHES = ["1000", "10000", "100000", "1000000", "5000000"]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--fresh", action="store_true",
                   help="delete the target CSVs first (full rebuild)")
    p.add_argument("--results-b", default="results/TestingResults_gridB.csv")
    p.add_argument("--results-a", default="results/TestingResults_gridA.csv")
    p.add_argument("--backend-a", default="auto", choices=["auto", "xla", "fused"],
                   help="Grid A kriging/IDW backend; 'auto' = transposed "
                   "Pallas valid-grid select on TPU (the r3 winner)")
    p.add_argument("--skip-exact", action="store_true",
                   help="skip the (slow) bit-exact parity rows")
    args = p.parse_args()

    from auvtpu.utils.device import wait_for_device

    wait_for_device()
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    if dev.platform == "cpu":
        print("refusing to stamp 'TPU' rows from a CPU run", flush=True)
        sys.exit(1)

    if args.fresh:
        for f in (args.results_b, args.results_a):
            if os.path.exists(f):
                os.remove(f)
                print(f"removed {f} (--fresh)", flush=True)

    from auvtpu.cli import bench_grid_a, bench_grid_b, figures, prototype

    regions = REGIONS[:1] if args.quick else REGIONS
    variants = [[], ["--convention", "centered"], ["--variogram-model", "gaussian"]]
    if not args.skip_exact:
        variants.append(["--selection", "exact"])
    for region, removal in regions:
        for extra in variants:
            argv = [
                "--region", region, "--removal", removal,
                "--results", args.results_b,
            ] + extra
            if "exact" in extra:
                # exact mode flips jax_enable_x64 process-wide; isolate it in
                # a subprocess so the remaining f32 runs stay untouched
                import subprocess

                subprocess.run(
                    [sys.executable, "-m", "auvtpu.cli.bench_grid_b"] + argv,
                    check=True,
                )
            else:
                bench_grid_b.main(argv)

    batches = BATCHES[:2] if args.quick else BATCHES
    bench_grid_a.main([
        "--batch-sizes", *batches,
        "--results", args.results_a,
        "--backend", args.backend_a,
    ])

    # AIDW headline measurement (VERDICT r2 weak #4): variable-density strip
    # sampling of the real US-East tile, rows committed next to the Grid B data
    if not args.quick:
        prototype.main([
            "--region", "us_east_coast", "--subset", "0.01",
            "--methods", "idw", "aidw", "--density", "strip",
            "--results", args.results_b,
        ])

    # learned-baseline rows: self-supervised masked-conv inpainter, trained
    # and evaluated ON THE CHIP for every region (VERDICT r3 item 3) —
    # checkpoints committed, plus an untouched-mask-seed eval (seed 7: the
    # w16/d2/400 hyperparameters were only ever tuned on seed-42 masks)
    if not args.quick:
        try:
            from auvtpu.cli import learned_eval

            for region, removal in regions:
                learned_eval.main([
                    "--region", region, "--removal", removal,
                    "--results", args.results_b,
                    "--save-params", f"results/learned_{region}_w16d2.npz",
                ])
                learned_eval.main([
                    "--region", region, "--removal", removal,
                    "--seed", "7", "--region-suffix", "_seed7",
                    "--results", args.results_b,
                ])
        except Exception as e:  # flax missing or OOM must not junk the rest
            print(f"learned rows skipped: {type(e).__name__}: {e}", flush=True)

    figures.main(["--grid-a", args.results_a, "--grid-b", args.results_b])
    print("campaign done", flush=True)


if __name__ == "__main__":
    main()
