"""On-device neighbor search: kNN and radius graphs over nuclei centroids.

TPU-native replacement for the reference's CPU spatial indexing
(``hovernet_tile_inference.ipynb``: ``libpysal.KNN.from_array(coords, k=5)``
cell 11; ``cKDTree.query_ball_tree(r=40µm)`` cells 23-27; SURVEY.md §2
C20). Instead of tree structures (pointer-chasing, hostile to the MXU),
both queries run as chunked dense-distance reductions under ``lax.scan``:

- queries are processed in blocks of ``q_chunk``;
- the database streams through in blocks of ``db_chunk``;
- a running top-k (by negative distance) merges each database block, so
  peak memory is q_chunk × (db_chunk + k) regardless of N.

10⁵-10⁶ nuclei × k=5 fits comfortably. Distances are diff-based (exact in
f32; the ‖a‖²+‖b‖²-2a·b matmul trick loses ~1% relative accuracy on
far-from-origin slide coordinates).

Radius queries reuse the same machinery with k = ``max_degree`` and a
distance mask — degree is capped (nearest-first), which the reference's
unbounded ball query doesn't do; the cap is configurable and logged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(1e30)


@partial(jax.jit, static_argnames=("k", "db_chunk"))
def _knn_block(
    queries: jnp.ndarray, db: jnp.ndarray, k: int, db_chunk: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """queries (Q, 2), db (N, 2) padded with +1e9 sentinel rows →
    (dist² (Q, k), idx (Q, k)). Includes self-matches; caller filters."""
    n = db.shape[0]
    pad = (-n) % db_chunk
    db_p = jnp.concatenate([db, jnp.full((pad, 2), 1e9, db.dtype)], axis=0)
    blocks = db_p.reshape(-1, db_chunk, 2)
    block_ids = jnp.arange(blocks.shape[0]) * db_chunk

    def body(carry, blk):
        best_d, best_i = carry
        pts, base = blk
        # diff-based distances: exact in f32 (the ‖a‖²+‖b‖²-2ab matmul trick
        # loses ~1% on far-from-origin coordinates); for 2-D points the
        # VPU cost is negligible
        diff = queries[:, None, :] - pts[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        ids = base + jnp.arange(db_chunk, dtype=jnp.int32)[None, :]
        ids = jnp.broadcast_to(ids, d2.shape)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        neg, pos = jax.lax.top_k(-cat_d, k)
        return (-neg, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (
        jnp.full((queries.shape[0], k), _BIG),
        jnp.full((queries.shape[0], k), -1, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(body, init, (blocks, block_ids))
    return best_d, best_i


def knn(
    points: np.ndarray,
    k: int = 5,
    q_chunk: int = 2048,
    db_chunk: int = 4096,
    include_self: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """k nearest neighbors of every point among all points.
    Returns (dists (N, k) float32 Euclidean, indices (N, k) int32)."""
    pts = jnp.asarray(np.asarray(points, np.float32))
    n = len(points)
    # never ask for more neighbors than exist (sentinel rows would leak
    # out-of-range indices / ~1e9 distances into the results)
    k = max(min(k, n if include_self else n - 1), 1)
    kk = k if include_self else k + 1
    kk = min(kk, n)
    out_d, out_i = [], []
    for start in range(0, n, q_chunk):
        q = pts[start : start + q_chunk]
        d2, idx = _knn_block(q, pts, kk, db_chunk)
        out_d.append(np.asarray(d2))
        out_i.append(np.asarray(idx))
    d2 = np.concatenate(out_d, axis=0)
    idx = np.concatenate(out_i, axis=0)
    # mask any sentinel/pad matches (idx outside [0, n))
    invalid = (idx < 0) | (idx >= n)
    d2 = np.where(invalid, np.inf, d2)
    idx = np.where(invalid, -1, idx)
    if not include_self:
        # drop each row's self-match: push it to +inf, re-sort, keep first k
        self_mask = idx == np.arange(n)[:, None]
        d2 = np.where(self_mask, np.inf, d2)
        order = np.argsort(d2, axis=1, kind="stable")[:, :k]
        d2 = np.take_along_axis(d2, order, axis=1)
        idx = np.take_along_axis(idx, order, axis=1)
        # a degenerate row (e.g. n == 1) keeps the self index after the
        # inf push — restore the documented -1 sentinel for inf slots
        idx = np.where(np.isinf(d2), -1, idx)
    return np.sqrt(d2), idx


def radius_graph(
    points: np.ndarray,
    radius: float,
    max_degree: int = 64,
    q_chunk: int = 2048,
    db_chunk: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Edges (i→j) for all pairs within ``radius`` (excluding self), degree
    capped at ``max_degree`` nearest. Returns (edge_index (2, E) int64,
    edge_dist (E,) float32) — the notebook's cKDTree ball-query contract."""
    pts = jnp.asarray(np.asarray(points, np.float32))
    n = len(points)
    srcs, dsts, dists = [], [], []
    for start in range(0, n, q_chunk):
        q = pts[start : start + q_chunk]
        d2, idx = _knn_block(q, pts, min(max_degree + 1, n), db_chunk)
        d = np.sqrt(np.asarray(d2))
        idx = np.asarray(idx)
        gids = start + np.arange(d.shape[0])
        mask = (idx != gids[:, None]) & (d <= radius) & (idx >= 0)
        rr, cc = np.nonzero(mask)
        srcs.append((start + rr).astype(np.int64))
        dsts.append(idx[rr, cc].astype(np.int64))
        dists.append(d[rr, cc])
    if not srcs:
        return np.zeros((2, 0), np.int64), np.zeros((0,), np.float32)
    edge_index = np.stack([np.concatenate(srcs), np.concatenate(dsts)], axis=0)
    edge_dist = np.concatenate(dists).astype(np.float32)
    return edge_index, edge_dist
