"""Seeded random masking — the domain-level fault-injection module.

Reproduces subset_bathymetry.py:32-44 exactly (numpy legacy RandomState,
``np.random.choice(total, n, replace=False)`` with seed 42) so Grid B error
numbers are comparable with the reference's published tables, and additionally
offers a jax.random variant for on-device masking.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .config import DEFAULT_MASK_SEED


def select_random_points(
    shape: tuple[int, int], removal_fraction: float, seed: int = DEFAULT_MASK_SEED
) -> np.ndarray:
    """Flat indices of cells to remove; bit-identical to the reference pipeline
    (subset_bathymetry.py:32-39 uses the global np.random with the same call).

    Returns int64 array of length int(H*W*removal_fraction), in the order the
    reference writes them to reference_missing.csv.
    """
    rows, cols = shape
    total = rows * cols
    n_remove = int(total * removal_fraction)
    rng = np.random.RandomState(seed)
    return rng.choice(total, size=n_remove, replace=False)


def mask_grid(
    elev: np.ndarray, removal_fraction: float, seed: int = DEFAULT_MASK_SEED
):
    """Apply the reference masking pipeline to a dense (H, W) array.

    Returns (reduced, removed_rc, removed_vals):
      reduced      (H, W) float64 with removed cells = NaN,
      removed_rc   (N, 2) int (row, col) in selection order,
      removed_vals (N,) float64 held-out truth.
    """
    elev = np.asarray(elev, dtype=np.float64)
    flat_idx = select_random_points(elev.shape, removal_fraction, seed)
    rows, cols = np.divmod(flat_idx, elev.shape[1])
    vals = elev[rows, cols].copy()
    reduced = elev.copy()
    reduced[rows, cols] = np.nan
    return reduced, np.stack([rows, cols], axis=1), vals


def random_mask_device(key: jax.Array, shape: tuple[int, int], removal_fraction: float):
    """On-device masking: boolean removal mask via jax.random (deterministic
    under jax PRNG keys; fixes the reference's unseeded query-point gap)."""
    n = shape[0] * shape[1]
    n_remove = int(n * removal_fraction)
    perm = jax.random.permutation(key, n)
    removed = perm[:n_remove]
    mask = jnp.zeros((n,), dtype=bool).at[removed].set(True)
    return mask.reshape(shape)
