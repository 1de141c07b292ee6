"""Host-side batch chunking for scattered ops.

The windowed scattered ops materialize (N, window^2) candidate tensors; at
radius 10 that is 1.7 KB/query, so multi-million-point batches must be
chunked.  Chunks are padded to one fixed shape so only a single program is
compiled regardless of batch size.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def apply_chunked(fn, grid, lons, lats, *, chunk: int = 1 << 20, **kw):
    """Run ``fn(grid, lons_chunk, lats_chunk, **kw)`` over fixed-size chunks.

    Returns a host numpy array of length N.  Chunks are padded with the first
    query (harmless work) to keep one compiled shape.
    """
    lons = np.asarray(lons)
    lats = np.asarray(lats)
    n = lons.shape[0]
    if n <= chunk:
        pad = chunk - n if n < chunk and n > chunk // 2 else 0
        if n <= chunk // 2 or pad == 0:
            # small batches: just run at native size (one-off compile)
            return np.asarray(fn(grid, jnp.asarray(lons), jnp.asarray(lats), **kw))
    out = np.empty(n, np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        lo = lons[s:e]
        la = lats[s:e]
        if e - s < chunk:
            lo = np.concatenate([lo, np.broadcast_to(lo[:1], (chunk - (e - s),))])
            la = np.concatenate([la, np.broadcast_to(la[:1], (chunk - (e - s),))])
        out[s:e] = np.asarray(fn(grid, jnp.asarray(lo), jnp.asarray(la), **kw))[: e - s]
    return out
