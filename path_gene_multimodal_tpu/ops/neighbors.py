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

Radius queries default to the reference's exact UNBOUNDED ball-query
semantics, served by the host cKDTree up to ``HOST_TREE_MAX_N`` — which
covers the full stated production scale (10⁶ nuclei per WSI). The
static-shape device dense scan remains for the scipy-absent fallback,
beyond-production point counts, and wide explicitly-capped queries
(``HOST_TREE_CELL_BUDGET``); it caps degree at 256 nearest-first, and an
explicit ``max_degree`` opts into capping everywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from path_gene_multimodal_tpu.utils.log import get_logger

# numpy scalar, NOT jnp — a module-level jnp scalar would initialize the
# JAX backend at import time (see ops/components.INF note)
_BIG = np.float32(1e30)

# static-shape degree cap on the device radius path (max_degree=None asks
# for the reference's uncapped semantics; above HOST_TREE_MAX_N we must cap
# — an extra probe column detects and WARNS when the cap actually bites)
DEVICE_RADIUS_CAP = 256

# below this point count the host cKDTree beats the device path outright:
# the chunked dense scan is O(N²) distance pairs + top_k over the db lanes
# plus the device round-trip, while tree queries are O(N log N) on host —
# measured: 54k points = 0.15 s build+kNN+ball on ONE host core vs ~2 s of
# device-path D2H over the dev tunnel; 200k points = ~3 s host vs 454 s
# dense scan on the CPU backend; 1M points ≈ 30 s host (query_pairs ball).
# The host path is also the one with the reference's exact uncapped
# ball-query semantics, so the threshold doubles as the exact-semantics
# range — it now covers the full stated production scale (10⁶ nuclei per
# WSI); the device dense scan remains only as the scipy-absent fallback
# and for beyond-production point counts.
HOST_TREE_MAX_N = 2_097_152

# ...but host-tree cost and transients scale with n·kk, and the numbers
# above were measured at small k (kNN k=6) plus the query_pairs ball. An
# explicitly-capped query (max_degree=256 → kk=257) at 2M points would
# allocate >10 GB of (n, kk) float64/int64 transients and run a far
# slower k=257 tree query — so wide queries keep the device path beyond
# this n·kk budget (2²⁵ cells ≈ the old 131072-point threshold at kk=257,
# preserving the previously-measured capped behavior exactly).
HOST_TREE_CELL_BUDGET = 1 << 25


def _host_tree(points: np.ndarray):
    try:
        from scipy.spatial import cKDTree
    except Exception:  # pragma: no cover - scipy absent → device path
        return None
    return cKDTree(points)


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


@partial(jax.jit, static_argnames=("k", "db_chunk", "drop_self", "compact"))
def _knn_filtered(
    queries: jnp.ndarray,
    db: jnp.ndarray,
    n_true,
    gid_base,
    r2: float,
    k: int,
    db_chunk: int,
    drop_self: bool,
    compact: bool,
) -> jnp.ndarray:
    """Neighbor indices (Q, k) with ALL filtering done on device: pad/
    sentinel rows, optional self-match drop (stable re-sort), optional
    radius cut. Invalid slots are -1. Only the index matrix crosses the
    device→host boundary (as uint16 when ``compact``) — distances are
    recomputed host-side from the points, which cuts D2H bytes ~6× (the
    dev-environment tunnel moves ~25 MB/s, so transfer IS the graph-stage
    cost). ``n_true`` (the unpadded point count) and ``gid_base`` are
    traced scalars so every slide's nucleus count reuses ONE compiled
    program per (q_chunk, db-bucket) shape."""
    d2, idx = _knn_block(queries, db, k, db_chunk)
    invalid = (idx < 0) | (idx >= n_true) | (d2 >= _BIG)
    if drop_self:
        gids = gid_base + jnp.arange(queries.shape[0], dtype=jnp.int32)
        invalid = invalid | (idx == gids[:, None])
    if r2 is not None:
        invalid = invalid | (d2 > r2)
    # stable re-sort pushing invalid slots to the end, keeping distance order
    d2 = jnp.where(invalid, jnp.inf, d2)
    order = jnp.argsort(d2, axis=1, stable=True)
    idx = jnp.take_along_axis(jnp.where(invalid, -1, idx), order, axis=1)
    if compact:  # n < 2**16 - 1: -1 → 0xFFFF survives the uint16 round-trip
        idx = idx.astype(jnp.uint16)
    return idx


def _host_or_device_indices(
    pts_np: np.ndarray, n: int, kk: int, q_chunk: int, db_chunk: int,
    drop_self: bool = True, radius=None,
) -> np.ndarray:
    """(N, kk) neighbor indices, nearest-first, -1 invalid (self dropped
    when ``drop_self``, out-of-radius dropped when ``radius``) — host
    cKDTree for small n, chunked device scan otherwise (same contract)."""
    if (
        n <= HOST_TREE_MAX_N
        and n * kk <= HOST_TREE_CELL_BUDGET
        and (tree := _host_tree(pts_np)) is not None
    ):
        d, i = tree.query(pts_np, k=kk, workers=-1)
        d = np.asarray(d, np.float32).reshape(n, -1)
        i = np.asarray(i).reshape(n, -1).astype(np.int32)
        # push self-matches (and scipy's n-index "missing" sentinel) to the
        # end, keeping distance order — the device path's convention
        invalid = i >= n
        if drop_self:
            invalid |= i == np.arange(n)[:, None]
        if radius is not None:
            invalid |= d > radius
        d = np.where(invalid, np.inf, d)
        order = np.argsort(d, axis=1, kind="stable")
        return np.take_along_axis(np.where(invalid, -1, i), order, axis=1)
    return _neighbor_indices(
        pts_np, n, kk, radius, q_chunk, db_chunk, drop_self=drop_self,
    )


def _neighbor_indices(
    pts: np.ndarray, n: int, kk: int, radius, q_chunk: int, db_chunk: int,
    drop_self: bool,
) -> np.ndarray:
    """Host-side driver: chunked device query → int32 (N, kk) indices,
    -1 invalid.

    Shapes are BUCKETED for compile-cache reuse across slides: the db is
    padded host-side to a ``db_chunk`` multiple with +1e9 sentinel rows and
    the final query chunk is padded to ``q_chunk``; the true count rides
    along as a traced scalar. Without this, every slide's nucleus count is
    a fresh program (minutes of compile over a tunnel)."""
    compact = n < 2**16 - 1
    r2 = None if radius is None else float(radius) ** 2
    pts_np = np.asarray(pts, np.float32)
    pad_db = (-n) % db_chunk
    db_np = (
        np.concatenate([pts_np, np.full((pad_db, 2), 1e9, np.float32)])
        if pad_db else pts_np
    )
    db = jnp.asarray(db_np)
    n_true = jnp.asarray(n, jnp.int32)
    out = []
    for start in range(0, n, q_chunk):
        q_np = pts_np[start : start + q_chunk]
        q_pad = q_chunk - len(q_np)
        if q_pad:
            q_np = np.concatenate([q_np, np.full((q_pad, 2), 1e9, np.float32)])
        raw = np.asarray(
            _knn_filtered(jnp.asarray(q_np), db, n_true,
                          jnp.asarray(start, jnp.int32), r2, kk, db_chunk,
                          drop_self, compact)
        )
        if q_pad:
            raw = raw[:-q_pad]
        out.append(raw.astype(np.int32))
    idx = np.concatenate(out, axis=0)
    if compact:
        idx[idx == 0xFFFF] = -1
    return idx


def _dists_from_idx(
    pts_np: np.ndarray, idx: np.ndarray, row_chunk: int = 65536
) -> np.ndarray:
    """Recompute Euclidean distances for an (N, K) index matrix host-side
    in row chunks (a full (N, K, 2) broadcast is ~3 GB transient at WSI
    scale, 10⁶ nuclei × cap 256 — ADVICE r2). -1 slots → inf."""
    n = len(idx)
    d = np.empty(idx.shape, np.float32)
    for s in range(0, n, row_chunk):
        blk = idx[s : s + row_chunk]
        diff = pts_np[s : s + row_chunk, None, :] - pts_np[np.maximum(blk, 0)]
        np.sqrt(np.sum(diff * diff, axis=-1, dtype=np.float32), out=d[s : s + row_chunk])
    d[idx < 0] = np.inf
    return d


def _warn_radius_cap(idx: np.ndarray, d: np.ndarray, cap: int, radius: float) -> None:
    """Probe column ``cap`` (requested beyond the emitted slots): a valid
    in-radius entry there means that node has > ``cap`` neighbors and the
    device path silently dropped edges (ADVICE r2 medium)."""
    if idx.shape[1] <= cap:
        return
    overflow = (idx[:, cap] >= 0) & (d[:, cap] <= radius)
    n_over = int(overflow.sum())
    if n_over:
        get_logger().warning(
            "radius_graph device path: %d/%d nodes exceed the %d-neighbor "
            "degree cap at r=%.1f — edges beyond the cap were dropped "
            "(nearest-first). Pass max_degree to raise the cap or accept it "
            "explicitly; the reference's uncapped ball query is host-only.",
            n_over, len(idx), cap, radius,
        )


def knn(
    points: np.ndarray,
    k: int = 5,
    q_chunk: int = 2048,
    db_chunk: int = 4096,
    include_self: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """k nearest neighbors of every point among all points.
    Returns (dists (N, k) float32 Euclidean, indices (N, k) int32)."""
    pts_np = np.asarray(points, np.float32)
    n = len(points)
    if n == 0:  # same empty contract as combined_graphs/radius_graph
        return np.zeros((0, k), np.float32), np.zeros((0, k), np.int32)
    # never ask for more neighbors than exist (sentinel rows would leak
    # out-of-range indices / ~1e9 distances into the results)
    k = max(min(k, n if include_self else n - 1), 1)
    kk = min(k if include_self else k + 1, n)
    idx = _host_or_device_indices(
        pts_np, n, kk, q_chunk, db_chunk, drop_self=not include_self
    )[:, :k]
    # distances recomputed host-side from the coordinates (exact same
    # f32 diff-based formula the device uses), chunked to bound memory
    d = _dists_from_idx(pts_np, idx)
    return d, idx



def _host_ball_edges(
    tree, pts_np: np.ndarray, radius: float
) -> tuple[np.ndarray, np.ndarray]:
    """UNCAPPED radius edges — the reference's exact ball-query semantics
    (``cKDTree.query_ball_tree(r)``, notebook cells 23-27; both use ≤ r
    and exclude self). ``query_pairs`` returns the unique i<j pairs as ONE
    ndarray — measured 8× faster than ``query_ball_point`` + densifying
    100k Python lists (0.13 s vs 1.0 s at 100k points / 5M edges) —
    then both directions are emitted to match the ball-query edge set.
    Used when ``max_degree=None`` on the host path; the device path must
    cap (static shapes)."""
    pairs = tree.query_pairs(r=radius, output_type="ndarray")
    if len(pairs) == 0:
        return np.zeros((2, 0), np.int64), np.zeros((0,), np.float32)
    diff = pts_np[pairs[:, 0]] - pts_np[pairs[:, 1]]
    d = np.sqrt(np.sum(diff * diff, axis=-1, dtype=np.float32)).astype(np.float32)
    src = np.concatenate([pairs[:, 0], pairs[:, 1]]).astype(np.int64)
    dst = np.concatenate([pairs[:, 1], pairs[:, 0]]).astype(np.int64)
    return np.stack([src, dst], axis=0), np.concatenate([d, d])


def combined_graphs(
    points: np.ndarray,
    k: int = 5,
    radius: float = 160.0,
    max_degree: int | None = None,
    q_chunk: int = 2048,
    db_chunk: int = 4096,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """kNN graph AND radius graph from ONE device query (the kNN columns
    are a prefix of the radius candidates) — halves the device dispatch
    round-trips, which dominate graph-stage latency on a tunnel-attached
    chip. Returns (knn_dists (N, k), knn_idx (N, k), edge_index (2, E),
    edge_dist (E,)) with exactly the ``knn``/``radius_graph`` contracts.

    ``max_degree=None`` (default) = UNCAPPED radius edges, the reference's
    exact ball-query semantics — served by the host tree below
    ``HOST_TREE_MAX_N``; the device path (static shapes) caps at 256 per
    node, nearest-first."""
    pts_np = np.asarray(points, np.float32)
    n = len(points)
    if n == 0:
        return (
            np.zeros((0, k), np.float32), np.zeros((0, k), np.int32),
            np.zeros((2, 0), np.int64), np.zeros((0,), np.float32),
        )
    k = max(min(k, n - 1), 1)
    if max_degree is None and n <= HOST_TREE_MAX_N and (
        tree := _host_tree(pts_np)
    ) is not None:
        # mirrors _host_or_device_indices' invalid-marking + stable-resort
        # convention (kept inline because this path also needs the query's
        # OWN distances); test_combined_graphs_matches_separate pins the two
        # against each other, so drift fails loudly
        d_q, i_q = tree.query(pts_np, k=min(k + 1, n), workers=-1)
        d_q = np.asarray(d_q, np.float32).reshape(n, -1)
        i_q = np.asarray(i_q).reshape(n, -1).astype(np.int32)
        invalid = (i_q == np.arange(n)[:, None]) | (i_q >= n)
        d_q = np.where(invalid, np.inf, d_q)
        order = np.argsort(d_q, axis=1, kind="stable")
        i_q = np.take_along_axis(np.where(invalid, -1, i_q), order, axis=1)
        d_q = np.take_along_axis(d_q, order, axis=1)
        knn_i = np.pad(i_q[:, :k], ((0, 0), (0, max(k - i_q.shape[1], 0))),
                       constant_values=-1)
        knn_d = np.pad(d_q[:, :k], ((0, 0), (0, max(k - d_q.shape[1], 0))),
                       constant_values=np.inf).astype(np.float32)
        edge_index, edge_dist = _host_ball_edges(tree, pts_np, radius)
        return knn_d, knn_i, edge_index, edge_dist
    cap = DEVICE_RADIUS_CAP if max_degree is None else max_degree
    # when the caller asked for UNCAPPED semantics, request one probe
    # column past the cap so a silent overflow becomes a logged warning
    probe = 1 if max_degree is None else 0
    kk = min(max(k + 1, cap + 1 + probe), n)
    idx = _host_or_device_indices(pts_np, n, kk, q_chunk, db_chunk)
    d = _dists_from_idx(pts_np, idx)
    if probe:
        _warn_radius_cap(idx, d, cap, radius)
    knn_d, knn_i = d[:, :k].copy(), idx[:, :k].copy()
    rmask = (idx[:, :cap] >= 0) & (d[:, :cap] <= radius)
    rr, cc = np.nonzero(rmask)
    if len(rr) == 0:
        edge_index = np.zeros((2, 0), np.int64)
        edge_dist = np.zeros((0,), np.float32)
    else:
        edge_index = np.stack(
            [rr.astype(np.int64), idx[rr, cc].astype(np.int64)], axis=0
        )
        edge_dist = d[rr, cc].astype(np.float32)
    return knn_d, knn_i, edge_index, edge_dist


def radius_graph(
    points: np.ndarray,
    radius: float,
    max_degree: int | None = None,
    q_chunk: int = 2048,
    db_chunk: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Edges (i→j) for all pairs within ``radius`` (excluding self).
    Returns (edge_index (2, E) int64, edge_dist (E,) float32) — the
    notebook's cKDTree ball-query contract. ``max_degree=None`` (default)
    = uncapped, exactly the reference's semantics (host tree below
    ``HOST_TREE_MAX_N``; the static-shape device path caps at 256,
    nearest-first); an int caps the degree explicitly."""
    pts_np = np.asarray(points, np.float32)
    n = len(points)
    if n == 0:
        return np.zeros((2, 0), np.int64), np.zeros((0,), np.float32)
    if max_degree is None and n <= HOST_TREE_MAX_N and (
        tree := _host_tree(pts_np)
    ) is not None:
        return _host_ball_edges(tree, pts_np, radius)
    cap = DEVICE_RADIUS_CAP if max_degree is None else max_degree
    probe = 1 if max_degree is None else 0
    idx = _host_or_device_indices(
        pts_np, n, min(cap + 1 + probe, n), q_chunk, db_chunk, radius=radius
    )
    if probe and idx.shape[1] > cap:
        # the radius filter already ran on device: a valid probe slot IS
        # an in-radius neighbor beyond the cap
        n_over = int((idx[:, cap] >= 0).sum())
        if n_over:
            get_logger().warning(
                "radius_graph device path: %d/%d nodes exceed the "
                "%d-neighbor degree cap at r=%.1f — edges beyond the cap "
                "were dropped (nearest-first). Pass max_degree to raise "
                "the cap or accept it explicitly.",
                n_over, n, cap, radius,
            )
    idx = idx[:, :cap]
    rr, cc = np.nonzero(idx >= 0)
    if len(rr) == 0:
        return np.zeros((2, 0), np.int64), np.zeros((0,), np.float32)
    src = rr.astype(np.int64)
    dst = idx[rr, cc].astype(np.int64)
    diff = pts_np[src] - pts_np[dst]
    edge_dist = np.sqrt(np.sum(diff * diff, axis=-1, dtype=np.float32))
    return np.stack([src, dst], axis=0), edge_dist.astype(np.float32)
