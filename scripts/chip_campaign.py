"""Chip results campaign: refresh the committed results CSVs on hardware.

Runs, SERIALLY on the real chip (CLAUDE.md: one chip process at a time):
1. Grid B per region x removal, all methods, reference + centered +
   fitted-gaussian variogram rows -> results/TestingResults_gridB.csv;
2. Grid A batch sweep with the fused scattered backend
   -> results/TestingResults_gridA.csv;
3. figure regeneration (runtime curves, accuracy bars, variogram zoo).

Usage: python scripts/chip_campaign.py [--quick]
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
    p.add_argument("--results-b", default="results/TestingResults_gridB.csv")
    p.add_argument("--results-a", default="results/TestingResults_gridA.csv")
    args = p.parse_args()

    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    if dev.platform == "cpu":
        print("refusing to stamp 'TPU' rows from a CPU run", flush=True)
        sys.exit(1)

    from auvtpu.cli import bench_grid_a, bench_grid_b, figures

    regions = REGIONS[:1] if args.quick else REGIONS
    for region, removal in regions:
        for extra in ([], ["--convention", "centered"], ["--variogram-model", "gaussian"]):
            bench_grid_b.main([
                "--region", region, "--removal", removal,
                "--results", args.results_b,
            ] + extra)

    batches = BATCHES[:2] if args.quick else BATCHES
    bench_grid_a.main([
        "--batch-sizes", *batches,
        "--results", args.results_a,
        "--backend", "fused",
    ])

    figures.main(["--grid-a", args.results_a, "--grid-b", args.results_b])
    print("campaign done", flush=True)


if __name__ == "__main__":
    main()
