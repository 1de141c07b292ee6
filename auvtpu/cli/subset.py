"""Masking pipeline CLI (rebuild of subset_bathymetry.py).

Reads a GEBCO netCDF tile (or named region), flips rows, removes a seeded
random fraction of cells, and writes the four reference CSVs:
original_data.csv, reduced_data.csv (NaN holes), reference_missing.csv
(row,col,elev), reference_missing_coords.csv (lon,lat,elev).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import GEBCO_TILES
from ..io import load_gebco, write_grid_csv, write_reference_missing
from ..masking import select_random_points


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nc", default=None, help="netCDF path (or use --region)")
    p.add_argument("--region", default=None, choices=list(GEBCO_TILES))
    p.add_argument("--gebco-root", default="/root/reference/GEBCO-Data")
    p.add_argument("--removal", type=float, default=0.10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out-dir", default="test_data")
    args = p.parse_args(argv)

    path = args.nc or os.path.join(args.gebco_root, GEBCO_TILES[args.region]["path"])
    lat, lon, elev = load_gebco(path)
    data = elev[::-1].copy()  # subset_bathymetry.py:17

    os.makedirs(args.out_dir, exist_ok=True)
    write_grid_csv(os.path.join(args.out_dir, "original_data.csv"), data)

    flat = select_random_points(data.shape, args.removal, args.seed)
    rows, cols = np.divmod(flat, data.shape[1])
    vals = data[rows, cols].copy()
    print(f"Selected {len(flat)} points for removal.")

    write_reference_missing(
        os.path.join(args.out_dir, "reference_missing.csv"),
        np.stack([rows, cols], axis=1), vals,
    )
    # lon/lat variant indexes the *unflipped* lat by the flipped row index —
    # faithfully reproduced (subset_bathymetry.py:62-69)
    with open(os.path.join(args.out_dir, "reference_missing_coords.csv"), "w") as f:
        for r, c, v in zip(rows, cols, vals):
            f.write(f"{lon[c]:.10g},{lat[r]:.10g},{v:.10g}\n")

    reduced = data.copy()
    reduced[rows, cols] = np.nan
    write_grid_csv(os.path.join(args.out_dir, "reduced_data.csv"), reduced)
    print(f"Wrote original/reduced/reference CSVs to {args.out_dir}")


if __name__ == "__main__":
    main()
