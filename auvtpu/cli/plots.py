"""Visualization CLI (rebuild of graph_results.ipynb).

Writes PNG heatmaps instead of notebook cells:
- original / masked / reconstructed grids (cells 3-30, 32-70);
- the reconstruction merge is ``fill_reduced_grid`` (cell 38): observed cells
  keep their values, holes take the interpolated prediction;
- error map |reconstruction - truth| over the masked cells.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import GEBCO_TILES
from ..grid import RegularGrid
from ..masking import mask_grid
from .bench_grid_b import load_region


def _save_heatmap(path, data, title, vmin=None, vmax=None, cmap="viridis"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6), dpi=120)
    im = ax.imshow(data, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax, aspect="auto")
    ax.set_title(title)
    ax.set_xlabel("lon index")
    ax.set_ylabel("lat index")
    fig.colorbar(im, ax=ax, label="elevation (m)")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--region", default="mid_atlantic", choices=list(GEBCO_TILES))
    p.add_argument("--gebco-root", default="/root/reference/GEBCO-Data")
    p.add_argument("--removal", type=float, default=0.10)
    p.add_argument("--method", default="Kriging", choices=["Bilinear", "Cubic", "Kriging", "IDW"])
    p.add_argument("--out-dir", default="results_local/plots")
    args = p.parse_args(argv)

    from ..ops import fill_bilinear, fill_idw, fill_window_mean, kriging_at_cells
    import jax.numpy as jnp

    elev, ext = load_region(args.region, args.gebco_root)
    reduced, rc, truth = mask_grid(elev, args.removal)
    grid = RegularGrid.from_nan_array(reduced, ext)

    if args.method == "Kriging":
        rows = jnp.asarray(rc[:, 0], jnp.int32)
        cols = jnp.asarray(rc[:, 1], jnp.int32)
        pred = np.asarray(kriging_at_cells(grid, rows, cols))
        filled = reduced.copy()
        filled[rc[:, 0], rc[:, 1]] = pred
    else:
        plane = {
            "Bilinear": fill_bilinear,
            "Cubic": lambda g: fill_window_mean(g, k=4),
            "IDW": lambda g: fill_idw(g, k=8),
        }[args.method](grid)
        plane = np.asarray(plane)
        filled = np.where(np.isnan(reduced), plane, reduced)
        pred = plane[rc[:, 0], rc[:, 1]]

    os.makedirs(args.out_dir, exist_ok=True)
    vmin, vmax = np.nanmin(elev), np.nanmax(elev)
    pre = os.path.join(args.out_dir, f"{args.region}_r{args.removal}")
    _save_heatmap(f"{pre}_original.png", elev, f"{args.region} original", vmin, vmax)
    _save_heatmap(f"{pre}_masked.png", reduced, f"{args.region} masked ({args.removal:.0%})", vmin, vmax)
    _save_heatmap(
        f"{pre}_filled_{args.method.lower()}.png", filled,
        f"{args.region} reconstructed ({args.method})", vmin, vmax,
    )
    err = np.full_like(elev, np.nan)
    err[rc[:, 0], rc[:, 1]] = np.abs(pred - truth)
    _save_heatmap(
        f"{pre}_error_{args.method.lower()}.png", err,
        f"{args.region} |error| at masked cells ({args.method})", cmap="magma",
    )
    print(f"wrote 4 heatmaps to {args.out_dir}")


if __name__ == "__main__":
    main()
