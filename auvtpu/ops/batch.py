"""Host-side batch chunking for scattered ops.

The windowed scattered ops materialize (N, window^2) candidate tensors; at
radius 10 that is 1.7 KB/query, so multi-million-point batches must be
chunked.  Chunks are padded to one fixed shape so only a single program is
compiled regardless of batch size.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp


def apply_chunked(fn, grid, lons, lats, *, chunk: int = 1 << 20, **kw):
    """Run ``fn(grid, lons_chunk, lats_chunk, **kw)`` over fixed-size chunks.

    Returns a device array of length N (chunks stay on device and dispatch
    asynchronously; callers sync once).  Chunks are padded with the first
    query (harmless duplicate work) so only one program shape compiles.
    """
    lons = jnp.asarray(lons)
    lats = jnp.asarray(lats)
    n = lons.shape[0]
    if n <= chunk:
        return fn(grid, lons, lats, **kw)
    pad = (-n) % chunk
    if pad:
        lons = jnp.concatenate([lons, jnp.broadcast_to(lons[:1], (pad,))])
        lats = jnp.concatenate([lats, jnp.broadcast_to(lats[:1], (pad,))])
    outs = []
    for s in range(0, n + pad, chunk):
        outs.append(
            fn(
                grid,
                jax.lax.dynamic_slice_in_dim(lons, s, chunk),
                jax.lax.dynamic_slice_in_dim(lats, s, chunk),
                **kw,
            )
        )
    return jnp.concatenate(outs)[:n]
