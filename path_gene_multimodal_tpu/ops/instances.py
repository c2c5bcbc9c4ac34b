"""Vectorized per-instance features from instance label maps.

Replaces the reference's worst hot loop — per-nucleus ``regionprops`` +
``find_contours`` on the CPU (``aggregated_hovernet_run.py:172-198``,
SURVEY.md §2 C12) — with one scatter pass on device: areas, centroids,
bboxes and type votes for ALL instances of a tile batch at once. Contour
tracing (inherently sequential) stays on host but runs on tiny per-instance
bbox crops.

Label maps are dense 0-background int32 with ids < ``max_instances``
(static). Padded/absent ids yield area 0 and are filtered downstream.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_instances", "num_types"))
def instance_features(
    inst_map: jnp.ndarray,
    type_map: jnp.ndarray,
    max_instances: int = 512,
    num_types: int = 6,
) -> dict[str, jnp.ndarray]:
    """inst_map: (H, W) int32, 0 = background, ids 1..max_instances-1.
    type_map: (H, W) int32 per-pixel type (0 = background class).

    Returns per-id arrays of length ``max_instances`` (slot 0 = background,
    always zero): area, centroid_x/y (pixel coords, x = column), bbox
    [xmin, ymin, xmax, ymax] (max-exclusive), type (majority vote over
    non-background pixel types; 0 if none).

    Thin B=1 wrapper over :func:`instance_features_batch` — ONE moment/vote
    implementation, so fixes can't diverge between the per-tile and WSI
    paths.
    """
    out = instance_features_batch(
        inst_map[None], type_map[None], max_instances, num_types,
        use_pallas=False,
    )
    return {k: v[0] for k, v in out.items()}


@jax.jit
def compact_labels_device(lbl: jnp.ndarray) -> jnp.ndarray:
    """Batched on-device label compaction: (B, H, W) raw watershed labels
    (pixel-linear-index minima, INF background) → dense 1..N per tile,
    0 background, uint16 (valid because N ≤ pixels and ids ≤ max_instances
    downstream). Replaces the per-tile host ``np.unique`` pass and shrinks
    the device→host transfer 2×.

    PRECONDITION (root-pixel identity): every label value v must be the
    linear index of a pixel that itself carries label v. Both producers
    satisfy it by construction — CC labels are component minima, and
    marker-watershed labels are marker-component minima whose root pixel
    keeps its own label through flooding. It lets presence be the
    elementwise test ``flat[j] == j`` instead of a serialized TPU scatter."""
    b, h, w = lbl.shape
    n = h * w
    flat = lbl.reshape(b, n)
    valid = flat < 2**30
    target = jnp.where(valid, flat, 0)
    # label values are component-MIN pixel linear indices, so label j is
    # present in a tile iff pixel j carries its own index — an elementwise
    # test, no scatter (TPU scatters serialize; this was the hot op)
    present = (flat == jnp.arange(n, dtype=lbl.dtype)[None, :]).astype(jnp.int32)
    ranks = jnp.cumsum(present, axis=1)  # dense 1-based ids at label slots
    new = jnp.where(valid, jnp.take_along_axis(ranks, target, axis=1), 0)
    return new.reshape(b, h, w).astype(jnp.uint16)


def pack_labels_sparse(lbl: jnp.ndarray, budget: int):
    """Device-side sparse encoding of dense label maps for cheap D2H over
    thin links (the axon tunnel moves ~25 MB/s — a batch of dense maps is
    seconds of transfer; nuclei occupy ~1-20% of pixels).

    ``lbl``: (B, H, W) integer labels, 0 = background. Returns
    ``(count, idx, ids)``: ``count`` int32 scalar = the TRUE number of
    nonzero pixels (may exceed ``budget``); ``idx`` (budget,) int32 flat
    indices into ``lbl.reshape(-1)`` in ascending order; ``ids`` (budget,)
    uint16 label values at those pixels. Entries past ``count`` are
    padding. If ``count > budget`` the encoding is TRUNCATED — callers
    must fall back to a dense transfer (and may retry later batches with
    a larger budget). Trace inside jit with a static ``budget``."""
    flat = lbl.reshape(-1)
    nz = flat != 0
    count = jnp.sum(nz, dtype=jnp.int32)
    idx = jnp.nonzero(nz, size=budget, fill_value=0)[0].astype(jnp.int32)
    return count, idx, jnp.take(flat, idx).astype(jnp.uint16)


def unpack_labels_sparse(count, idx, ids, shape: tuple) -> np.ndarray:
    """Host-side inverse of :func:`pack_labels_sparse` → dense int32."""
    n = int(count)
    out = np.zeros(int(np.prod(shape)), np.int32)
    out[np.asarray(idx[:n])] = np.asarray(ids[:n])
    return out.reshape(shape)


def pack_features_sparse(feats: dict, budget: int):
    """Compact a (B, max_instances)-slotted feature dict to its LIVE slots
    (area > 0) on device: the slot tables are ~99% empty padding, which a
    thin link should not carry. Returns ``(count, idx, packed)`` with the
    same truncation contract as :func:`pack_labels_sparse` (``idx`` flat
    into the (B*max_instances,) slot axis). Only LIVE slots round-trip:
    dead slots unpack to zero, even for keys whose dense values are
    incidentally nonzero there (e.g. eccentricity's 0/eps guard) —
    consumers filter on ``area > 0`` before reading any key."""
    live = feats["area"].reshape(-1) > 0
    count = jnp.sum(live, dtype=jnp.int32)
    idx = jnp.nonzero(live, size=budget, fill_value=0)[0].astype(jnp.int32)
    packed = {k: jnp.take(v.reshape(-1), idx) for k, v in feats.items()}
    return count, idx, packed


def unpack_features_sparse(
    count, idx, packed: dict, batch: int, max_instances: int
) -> dict[str, np.ndarray]:
    """Host-side inverse of :func:`pack_features_sparse` → full
    (batch, max_instances) numpy slot tables."""
    n = int(count)
    sel = np.asarray(idx[:n])
    out = {}
    for k, v in packed.items():
        vn = np.asarray(v)
        full = np.zeros(batch * max_instances, vn.dtype)
        full[sel] = vn[:n]
        out[k] = full.reshape(batch, max_instances)
    return out


def groups_from_sparse(
    count, idx, ids, batch: int, height: int, width: int
) -> list[dict[int, tuple[np.ndarray, np.ndarray]]]:
    """Per-window {id: (ys, xs)} pixel groups straight from a sparse label
    encoding — one vectorized pass over the nonzero pixels, replacing a
    per-window ``np.nonzero`` scan of every dense map."""
    n = int(count)
    sel = np.asarray(idx[:n]).astype(np.int64)
    idv = np.asarray(ids[:n]).astype(np.int64)
    hw = height * width
    b = sel // hw
    r = sel % hw
    ys = r // width
    xs = r % width
    key = b * 65536 + idv  # ids are uint16 → the key is collision-free
    order = np.argsort(key, kind="stable")
    key, b, ys, xs, idv = key[order], b[order], ys[order], xs[order], idv[order]
    uniq, starts = np.unique(key, return_index=True)
    out: list[dict[int, tuple[np.ndarray, np.ndarray]]] = [
        {} for _ in range(batch)
    ]
    for j in range(len(uniq)):
        lo = starts[j]
        hi = starts[j + 1] if j + 1 < len(starts) else n
        out[int(b[lo])][int(idv[lo])] = (ys[lo:hi], xs[lo:hi])
    return out


@partial(jax.jit, static_argnames=("max_instances", "num_types", "use_pallas"))
def instance_features_batch(
    inst_maps: jnp.ndarray,
    type_maps: jnp.ndarray,
    max_instances: int = 512,
    num_types: int = 6,
    use_pallas: bool = False,
) -> dict[str, jnp.ndarray]:
    """Batched variant: (B, H, W) maps → per-id arrays (B, max_instances).

    ``use_pallas`` (TPU backend): segment reduction via one-hot MXU
    matmuls in a VMEM-resident kernel (``ops.pallas.instance_stats``) —
    ~20× the scatter formulation, which XLA serializes on TPU. Otherwise:
    ONE flat scatter over B·max_instances slots (ids offset by tile
    index) — a vmapped scatter lowers to B serial scatters; the flat
    version is ~2× faster at batch 32.
    """
    if use_pallas:
        from path_gene_multimodal_tpu.ops.pallas.instance_stats import (
            features_from_stats,
            instance_stats_pallas,
            stats_center,
        )

        sums, mins = instance_stats_pallas(
            inst_maps, type_maps, max_instances, num_types
        )
        center = stats_center(inst_maps.shape[1], inst_maps.shape[2])
        return features_from_stats(sums, mins, num_types, center=center)
    b, h, w = inst_maps.shape
    offset = jnp.arange(b, dtype=jnp.int32)[:, None, None] * max_instances
    n_slots_total = b * max_instances
    # background and ids ≥ max_instances (which would collide into the next
    # tile's slot range) are routed out of bounds; scatter mode="drop"
    # discards them, so every tile's slot 0 stays zero
    flat = jnp.where(
        (inst_maps > 0) & (inst_maps < max_instances),
        inst_maps + offset,
        n_slots_total,
    ).reshape(-1)
    ys = jnp.tile(
        (jnp.arange(h * w, dtype=jnp.int32) // w).astype(jnp.float32), (b,)
    )
    xs = jnp.tile(
        (jnp.arange(h * w, dtype=jnp.int32) % w).astype(jnp.float32), (b,)
    )
    n_slots = n_slots_total
    ones = jnp.ones_like(flat, jnp.float32)
    area = jnp.zeros(n_slots, jnp.float32).at[flat].add(ones, mode="drop")
    sum_x = jnp.zeros(n_slots, jnp.float32).at[flat].add(xs, mode="drop")
    sum_y = jnp.zeros(n_slots, jnp.float32).at[flat].add(ys, mode="drop")
    safe_area = jnp.maximum(area, 1.0)
    cx = sum_x / safe_area
    cy = sum_y / safe_area
    big = jnp.float32(1e9)
    xmin = jnp.full(n_slots, big).at[flat].min(xs, mode="drop")
    ymin = jnp.full(n_slots, big).at[flat].min(ys, mode="drop")
    xmax = jnp.full(n_slots, -big).at[flat].max(xs, mode="drop")
    ymax = jnp.full(n_slots, -big).at[flat].max(ys, mode="drop")
    # central moments via a SECOND scatter over centroid-shifted coords:
    # E[x²]−cx² in f32 over raw pixel coordinates cancels catastrophically
    # for small instances far from the tile origin (both terms ~1e6, the
    # difference ~10), skewing axis lengths / eccentricity / orientation by
    # percents; E[(x−cx)²] is exact at the same cost plus two cheap gathers
    cx_at = jnp.take(cx, flat, mode="fill", fill_value=0.0)
    cy_at = jnp.take(cy, flat, mode="fill", fill_value=0.0)
    dxs, dys = xs - cx_at, ys - cy_at
    sum_xx = jnp.zeros(n_slots, jnp.float32).at[flat].add(dxs * dxs, mode="drop")
    sum_yy = jnp.zeros(n_slots, jnp.float32).at[flat].add(dys * dys, mode="drop")
    sum_xy = jnp.zeros(n_slots, jnp.float32).at[flat].add(dxs * dys, mode="drop")
    mu_xx = sum_xx / safe_area
    mu_yy = sum_yy / safe_area
    mu_xy = sum_xy / safe_area
    common = jnp.sqrt(jnp.maximum(((mu_xx - mu_yy) / 2) ** 2 + mu_xy**2, 0.0))
    lam1 = jnp.maximum((mu_xx + mu_yy) / 2 + common, 0.0)
    lam2 = jnp.maximum((mu_xx + mu_yy) / 2 - common, 0.0)
    tflat = jnp.clip(type_maps.reshape(-1), 0, num_types - 1)
    votes = jnp.zeros((n_slots, num_types), jnp.float32)
    votes = votes.at[flat, tflat].add(jnp.where(tflat > 0, 1.0, 0.0), mode="drop")
    inst_type = jnp.where(
        jnp.sum(votes[:, 1:], axis=1) > 0,
        jnp.argmax(votes[:, 1:], axis=1) + 1,
        0,
    ).astype(jnp.int32)

    def r(x):
        return x.reshape(b, max_instances)

    return {
        "area": r(area),
        "centroid_x": r(cx),
        "centroid_y": r(cy),
        "bbox_xmin": r(jnp.where(area > 0, xmin, 0.0)),
        "bbox_ymin": r(jnp.where(area > 0, ymin, 0.0)),
        "bbox_xmax": r(jnp.where(area > 0, xmax + 1.0, 0.0)),
        "bbox_ymax": r(jnp.where(area > 0, ymax + 1.0, 0.0)),
        "type": r(inst_type),
        "major_axis": r(4.0 * jnp.sqrt(lam1)),
        "minor_axis": r(4.0 * jnp.sqrt(lam2)),
        "eccentricity": r(
            jnp.sqrt(jnp.maximum(1.0 - lam2 / jnp.maximum(lam1, 1e-12), 0.0))
        ),
        "orientation": r(0.5 * jnp.arctan2(2.0 * mu_xy, mu_xx - mu_yy)),
    }


def instance_contours(
    inst_map: np.ndarray,
    features: dict[str, np.ndarray],
    simplify_tol: float = 0.5,
    max_vertices: int | None = None,
) -> dict[int, np.ndarray]:
    """Host-side: per-instance exterior contour on the instance's bbox crop
    (reference: longest find_contours + approximate_polygon(tol=0.5),
    aggregated_hovernet_run.py:184-198). Returns {inst_id: (K, 2) [x, y]}."""
    from path_gene_multimodal_tpu.ops.contours import douglas_peucker, exterior_ring

    out: dict[int, np.ndarray] = {}
    area = np.asarray(features["area"])
    for inst_id in np.flatnonzero(area > 0):
        if inst_id == 0:
            continue
        inst_id = int(inst_id)
        x0 = int(features["bbox_xmin"][inst_id])
        y0 = int(features["bbox_ymin"][inst_id])
        x1 = int(features["bbox_xmax"][inst_id])
        y1 = int(features["bbox_ymax"][inst_id])
        crop = inst_map[y0:y1, x0:x1] == inst_id
        ring = exterior_ring(crop)
        if ring is None or len(ring) < 3:
            continue
        simp = douglas_peucker(ring, simplify_tol, closed=True)
        if len(simp) < 3:
            # DP collapsed a tiny ring (e.g. a 1-px diamond whose vertices
            # all sit exactly at tol) — keep the unsimplified exterior
            # rather than emitting a degenerate 2-point polygon
            simp = ring
        ring = simp
        xy = np.stack([ring[:, 1] + x0, ring[:, 0] + y0], axis=1)
        if max_vertices and len(xy) > max_vertices:
            step = int(np.ceil(len(xy) / max_vertices))
            xy = xy[::step]
        out[inst_id] = xy
    return out
