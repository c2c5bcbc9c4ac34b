"""HoverNeXt model, TTA equivariance, watershed vs priority-queue golden,
instance features vs regionprops-style golden."""

import heapq

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig, ConvNeXtV2
from path_gene_multimodal_tpu.models.hovernext import (
    HoverNeXt,
    HoverNeXtConfig,
    tta_forward,
)
from path_gene_multimodal_tpu.ops import watershed as ws
from path_gene_multimodal_tpu.ops.components import INF, compact_labels
from path_gene_multimodal_tpu.ops.instances import instance_contours, instance_features

SMALL_ENC = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128))
SMALL_CFG = HoverNeXtConfig(encoder=SMALL_ENC, decoder_dims=(64, 32, 16, 16), input_size=64)


def test_convnext_shapes():
    model = ConvNeXtV2(SMALL_ENC)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert [f.shape for f in feats] == [
        (2, 16, 16, 16), (2, 8, 8, 32), (2, 4, 4, 64), (2, 2, 2, 128)
    ]


def test_hovernext_output_shapes():
    model = HoverNeXt(SMALL_CFG)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["np"].shape == (2, 64, 64, 2)
    assert out["hv"].shape == (2, 64, 64, 2)
    assert out["tp"].shape == (2, 64, 64, 6)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def _blob_hv_model(params, pixels):
    """Equivariant reference 'model': derives NP/HV/TP from the input blob
    (mask = red channel > 0.5). HV = offset from blob centroid, so a correct
    TTA inverse-transform makes all 4 branches identical."""
    mask = pixels[..., 0] > 0.5
    b, h, w, _ = pixels.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = mask.astype(jnp.float32)
    tot = jnp.maximum(m.sum(axis=(1, 2), keepdims=True), 1.0)
    cx = (m * xs).sum(axis=(1, 2), keepdims=True) / tot
    cy = (m * ys).sum(axis=(1, 2), keepdims=True) / tot
    hmap = (xs - cx) * m
    vmap = (ys - cy) * m
    np_logits = jnp.stack([1.0 - m, m], axis=-1) * 10
    tp_logits = jnp.zeros((b, h, w, 6))
    return {"np": np_logits, "hv": jnp.stack([hmap, vmap], -1), "tp": tp_logits}


def test_tta_hv_equivariance():
    """With an exactly equivariant model, TTA-averaged HV equals the k=0
    branch — proves the inverse rotation + component remap is correct."""
    rng = np.random.default_rng(0)
    img = np.zeros((1, 16, 16, 3), np.float32)
    img[0, 4:9, 6:13, 0] = 1.0  # asymmetric blob
    base = _blob_hv_model(None, jnp.asarray(img))
    avg = tta_forward(_blob_hv_model, None, jnp.asarray(img), tta=4)
    np.testing.assert_allclose(np.asarray(avg["hv"]), np.asarray(base["hv"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(avg["np"]), np.asarray(base["np"]), atol=1e-4)


# ---------------------------------------------------------------------------
# watershed
# ---------------------------------------------------------------------------


def _golden_watershed(dist, markers, mask):
    """Serial priority-queue marker watershed (descending dist)."""
    h, w = dist.shape
    lbl = np.where(markers < int(INF), markers, -1).astype(np.int64)
    lbl[~mask] = -2
    heap = []
    counter = 0
    for y in range(h):
        for x in range(w):
            if lbl[y, x] >= 0:
                heapq.heappush(heap, (-dist[y, x], counter, y, x))
                counter += 1
    while heap:
        _, _, y, x = heapq.heappop(heap)
        l = lbl[y, x]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and lbl[ny, nx] == -1:
                    lbl[ny, nx] = l
                    heapq.heappush(heap, (-dist[ny, nx], counter, ny, nx))
                    counter += 1
    return lbl


def _two_blob_fixture():
    """Two touching discs with proper NP/HV maps."""
    h = w = 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    centers = [(20.0, 16.0), (26.0, 30.0)]
    radius = 9.0
    np_prob = np.zeros((h, w), np.float32)
    hv = np.zeros((h, w, 2), np.float32)
    owner = np.full((h, w), -1)
    best = np.full((h, w), 1e9, np.float32)
    for i, (cy, cx) in enumerate(centers):
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        inside = d <= radius
        closer = inside & (d < best)
        owner[closer] = i
        best[closer] = d[closer]
        np_prob[inside] = 1.0
    for i, (cy, cx) in enumerate(centers):
        sel = owner == i
        hv[sel, 0] = np.clip((xx[sel] - cx) / radius, -1, 1)
        hv[sel, 1] = np.clip((yy[sel] - cy) / radius, -1, 1)
    return np_prob, hv, owner


def test_hover_instances_splits_touching_blobs():
    np_prob, hv, owner = _two_blob_fixture()
    lbl = np.asarray(ws.hover_instances(jnp.asarray(np_prob), jnp.asarray(hv)))
    dense, n = compact_labels(lbl)
    assert n == 2
    # each found instance maps to one true disc with high IoU
    for true_id in (0, 1):
        true_mask = owner == true_id
        overlaps = [
            (np.logical_and(dense == k, true_mask).sum() / max(np.logical_or(dense == k, true_mask).sum(), 1))
            for k in (1, 2)
        ]
        assert max(overlaps) > 0.75, overlaps


def test_marker_watershed_matches_priority_queue(rng):
    h = w = 40
    # smooth random energy in [0,1] with exact level quantization
    raw = rng.random((h, w)).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    dist = gaussian_filter(raw, 3)
    dist = (dist - dist.min()) / (dist.max() - dist.min())
    dist = np.round(dist * 63) / 63.0
    mask = np.ones((h, w), bool)
    markers = np.full((h, w), int(INF), np.int32)
    markers[8, 8] = 1
    markers[30, 28] = 2
    markers[12, 33] = 3
    ours = np.asarray(ws.marker_watershed(
        jnp.asarray(dist), jnp.asarray(markers), jnp.asarray(mask), levels=64
    ))
    golden = _golden_watershed(dist, markers, mask)
    agree = (ours == golden)[mask & (golden >= 0)].mean()
    assert agree > 0.95, agree
    # all foreground reached
    assert (ours[mask] < int(INF)).all()


def test_watershed_mid_slope_marker_arrival_order():
    """A marker sitting ON another basin's slope must be starved, not win
    an equal-speed wedge: the serial priority queue's arrival order lets
    the incumbent front pre-claim each contour before the mid-slope marker
    activates. Regression for the two-phase level flood (a single-phase
    synchronous BFS handed the slope marker ~40% of the cone)."""
    h = w = 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = np.sqrt((yy - 12.0) ** 2 + (xx - 12.0) ** 2)
    dist = np.clip(1.0 - r / 50.0, 0.0, 1.0).astype(np.float32)
    dist = np.round(dist * 31) / 31.0  # exact level quantization
    mask = np.ones((h, w), bool)
    markers = np.full((h, w), int(INF), np.int32)
    markers[12, 12] = 1          # basin owner at the peak
    markers[30, 30] = 2          # mid-slope interloper
    ours = np.asarray(ws.marker_watershed(
        jnp.asarray(dist), jnp.asarray(markers), jnp.asarray(mask), levels=32
    ))
    golden = _golden_watershed(dist, markers, mask)
    golden_b2 = int((golden == 2).sum())
    ours_b2 = int((ours == 2).sum())
    # serial gives the interloper only its immediate surroundings; allow
    # modest slack but nothing like the pre-fix equal-speed wedge
    assert golden_b2 <= 32, golden_b2
    assert ours_b2 <= 4 * max(golden_b2, 8), (ours_b2, golden_b2)
    agree = (ours == golden)[mask].mean()
    assert agree > 0.95, agree
    # the Pallas kernel path must share the two-phase semantics
    from path_gene_multimodal_tpu.ops.pallas.flood import (
        pallas_marker_watershed,
        pallas_supported,
    )

    plbl = np.asarray(pallas_marker_watershed(
        jnp.asarray(dist)[None], jnp.asarray(markers)[None],
        jnp.asarray(mask)[None], levels=32,
        interpret=not pallas_supported(),
    ))[0]
    np.testing.assert_array_equal(plbl, ours)


def test_watershed_respects_mask():
    dist = np.ones((10, 10), np.float32)
    mask = np.zeros((10, 10), bool)
    mask[:, :4] = True
    markers = np.full((10, 10), int(INF), np.int32)
    markers[5, 1] = 7
    out = np.asarray(ws.marker_watershed(jnp.asarray(dist), jnp.asarray(markers), jnp.asarray(mask)))
    assert (out[:, :4] == 7).all()
    assert (out[:, 4:] == int(INF)).all()


# ---------------------------------------------------------------------------
# instance features
# ---------------------------------------------------------------------------


def test_instance_features_golden(rng):
    inst = np.zeros((32, 40), np.int32)
    inst[4:10, 5:12] = 1          # rect
    inst[20:29, 25:33] = 2        # rect
    inst[15, 2] = 3               # single pixel
    types = np.zeros((32, 40), np.int32)
    types[4:10, 5:12] = 2
    types[20:29, 25:33] = 1
    types[20:22, 25:33] = 5       # minority type → majority still 1
    types[15, 2] = 4
    f = {k: np.asarray(v) for k, v in instance_features(
        jnp.asarray(inst), jnp.asarray(types), max_instances=8
    ).items()}
    assert f["area"][1] == 42 and f["area"][2] == 72 and f["area"][3] == 1
    np.testing.assert_allclose(f["centroid_x"][1], np.mean(np.arange(5, 12)))
    np.testing.assert_allclose(f["centroid_y"][2], np.mean(np.arange(20, 29)))
    assert [f["bbox_xmin"][1], f["bbox_ymin"][1], f["bbox_xmax"][1], f["bbox_ymax"][1]] == [5, 4, 12, 10]
    assert f["type"][1] == 2 and f["type"][2] == 1 and f["type"][3] == 4
    assert f["area"][4] == 0  # absent id


def test_instance_contours():
    inst = np.zeros((20, 20), np.int32)
    inst[5:10, 5:10] = 1
    f = {k: np.asarray(v) for k, v in instance_features(
        jnp.asarray(inst), jnp.asarray(np.ones((20, 20), np.int32)), max_instances=4
    ).items()}
    contours = instance_contours(inst, f, simplify_tol=0.0)
    assert 1 in contours
    xy = contours[1]
    # contour surrounds the square (within the half-pixel marching-squares band)
    assert xy[:, 0].min() >= 4.0 and xy[:, 0].max() <= 10.0
    assert xy[:, 1].min() >= 4.0 and xy[:, 1].max() <= 10.0


def test_tta_fold_batch_matches_sequential():
    img = np.zeros((2, 16, 16, 3), np.float32)
    img[0, 4:9, 6:13, 0] = 1.0
    img[1, 2:6, 3:8, 0] = 1.0
    seq = tta_forward(_blob_hv_model, None, jnp.asarray(img), tta=4, fold_batch=False)
    fold = tta_forward(_blob_hv_model, None, jnp.asarray(img), tta=4, fold_batch=True)
    for k in seq:
        np.testing.assert_allclose(np.asarray(fold[k]), np.asarray(seq[k]), atol=1e-5)


def test_instance_features_batch_matches_single(rng):
    from path_gene_multimodal_tpu.ops.instances import instance_features_batch

    insts = np.zeros((3, 24, 24), np.int32)
    types = np.zeros((3, 24, 24), np.int32)
    insts[0, 2:8, 3:9] = 1
    types[0, 2:8, 3:9] = 2
    insts[1, 10:20, 10:18] = 1
    insts[1, 0:4, 0:4] = 2
    types[1][insts[1] > 0] = 3
    # tile 2 empty
    batched = {k: np.asarray(v) for k, v in instance_features_batch(
        jnp.asarray(insts), jnp.asarray(types), max_instances=8).items()}
    for b in range(3):
        single = {k: np.asarray(v) for k, v in instance_features(
            jnp.asarray(insts[b]), jnp.asarray(types[b]), max_instances=8).items()}
        for key in single:
            # identical incl. slot 0 (single now delegates to the batch path)
            np.testing.assert_allclose(
                batched[key][b], single[key], atol=1e-4, err_msg=f"{key} b={b}"
            )


def test_instance_moments_translation_invariant(rng):
    """Shape features must not depend on where in the tile the instance
    sits: the old E[x²]−cx² f32 formula lost percents of major/minor axis
    for instances far from the origin (catastrophic cancellation)."""
    from path_gene_multimodal_tpu.ops.instances import instance_features_batch

    s = 1024
    lbl = np.zeros((2, s, s), np.int32)
    tp = np.ones((2, s, s), np.int32)
    lbl[0, 2:8, 3:7] = 1            # 6×4 rect at the origin
    lbl[1, 1000:1006, 999:1003] = 1  # the SAME rect near (1000, 1000)
    f = {k: np.asarray(v) for k, v in instance_features_batch(
        jnp.asarray(lbl), jnp.asarray(tp), max_instances=4).items()}
    for key in ("major_axis", "minor_axis", "eccentricity"):
        np.testing.assert_allclose(
            f[key][1][1], f[key][0][1], rtol=1e-4, err_msg=key
        )


def test_compact_labels_device_matches_host(rng):
    from path_gene_multimodal_tpu.ops.instances import compact_labels_device

    # raw min-index labels: each value is the linear index of the region's
    # min pixel (the producers' root-pixel identity — see the docstring)
    lbl = np.full((2, 16, 16), int(INF), np.int32)
    lbl[0, 2:5, 2:5] = 2 * 16 + 2     # 34
    lbl[0, 10:12, 3:6] = 10 * 16 + 3  # 163
    lbl[1, 0:4, 0:4] = 0
    dense = np.asarray(compact_labels_device(jnp.asarray(lbl)))
    assert dense.dtype == np.uint16
    for b in range(2):
        golden, n = compact_labels(lbl[b])
        np.testing.assert_array_equal(dense[b], golden)
