"""k-nearest-neighbor mean squared distance (simple_knn ``distCUDA2``).

The reference uses the CUDA ``distCUDA2(points) -> (N,) mean squared
distance to the 3 nearest neighbors`` for scale initialization
(``renderer_2dgs.py:92-96``, finetune path).  Chunked pairwise distances
with a top-k — O(N²) FLOPs on the MXU, fine for the N ≤ ~200k init-time
use; memory stays bounded by the chunk size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3, chunk: int = 2048) -> jnp.ndarray:
    """(N, 3) -> (N,) mean squared distance to the k nearest neighbors."""
    pts = points.astype(jnp.float32)
    N = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=-1)

    pad = (-N) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    sq_p = jnp.pad(sq, (0, pad), constant_values=jnp.inf)
    n_chunks = (N + pad) // chunk

    def one_chunk(i):
        q = jax.lax.dynamic_slice(pts_p, (i * chunk, 0), (chunk, 3))
        qsq = jax.lax.dynamic_slice(sq_p, (i * chunk,), (chunk,))
        qidx = i * chunk + jnp.arange(chunk)
        d2 = (
            qsq[:, None]
            - 2.0 * q @ pts.T
            + sq[None, :]
        )
        # exclude self
        d2 = jnp.where(qidx[:, None] == jnp.arange(N)[None, :], jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.maximum(-neg_top, 0.0).mean(axis=-1)

    out = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    return out.reshape(-1)[:N]
