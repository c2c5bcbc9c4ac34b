"""Sparse device→host label/feature encoding (ops.instances.pack_*).

The sliding-window and per-tile nuclei drivers ship label maps and feature
slots sparsely over the link (budget-sized fixed arrays + a true count);
these tests pin the pack/unpack round-trip, the group extraction, and the
truncation contract — including the integration fallback where a batch
overflows its budget and the driver must refetch dense and still produce
identical rows.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.ops.instances import (
    groups_from_sparse,
    instance_features_batch,
    pack_features_sparse,
    pack_labels_sparse,
    unpack_features_sparse,
    unpack_labels_sparse,
)


def _random_labels(rng, b=3, h=64, w=64, n_inst=9):
    lbl = np.zeros((b, h, w), np.int32)
    for bi in range(b):
        for i in range(1, n_inst + 1):
            y, x = rng.integers(0, h - 8), rng.integers(0, w - 8)
            lbl[bi, y : y + 6, x : x + 6] = i
    return lbl


def test_pack_unpack_labels_roundtrip():
    rng = np.random.default_rng(0)
    lbl = _random_labels(rng)
    cnt, idx, ids = pack_labels_sparse(jnp.asarray(lbl), budget=4096)
    assert int(cnt) == int((lbl != 0).sum())
    dense = unpack_labels_sparse(cnt, idx, ids, lbl.shape)
    np.testing.assert_array_equal(dense, lbl)


def test_pack_labels_truncation_signals_overflow():
    lbl = np.ones((1, 16, 16), np.int32)  # 256 nonzero px
    cnt, idx, ids = pack_labels_sparse(jnp.asarray(lbl), budget=64)
    assert int(cnt) == 256  # TRUE count, beyond the budget
    assert idx.shape == (64,) and ids.shape == (64,)
    # the truncated prefix is still a faithful sub-encoding
    sub = np.zeros(256, np.int32)
    sub[np.asarray(idx)] = np.asarray(ids)
    assert (sub != 0).sum() == 64


def test_groups_from_sparse_matches_dense_scan():
    def _group_instance_pixels(inst):  # independent dense-scan golden
        ys, xs = np.nonzero(inst > 0)
        out = {}
        for uid in np.unique(inst[ys, xs]):
            m = inst[ys, xs] == uid
            out[int(uid)] = (ys[m], xs[m])
        return out

    rng = np.random.default_rng(1)
    lbl = _random_labels(rng, b=4)
    cnt, idx, ids = pack_labels_sparse(jnp.asarray(lbl), budget=8192)
    got = groups_from_sparse(cnt, idx, ids, *lbl.shape)
    for bi in range(lbl.shape[0]):
        want = _group_instance_pixels(lbl[bi])
        assert set(got[bi]) == set(want)
        for k in want:
            # same pixel SET (order may differ between scan styles)
            a = set(zip(got[bi][k][0].tolist(), got[bi][k][1].tolist()))
            b = set(zip(want[k][0].tolist(), want[k][1].tolist()))
            assert a == b


def test_pack_unpack_features_roundtrip():
    rng = np.random.default_rng(2)
    lbl = _random_labels(rng)
    typ = (lbl > 0).astype(np.int32) * 2
    feats = instance_features_batch(
        jnp.asarray(lbl), jnp.asarray(typ), max_instances=32
    )
    cnt, idx, packed = pack_features_sparse(feats, budget=512)
    got = unpack_features_sparse(cnt, idx, packed, lbl.shape[0], 32)
    # contract: LIVE slots (area > 0) round-trip exactly; dead slots come
    # back zero (the originals may carry incidental values there, e.g.
    # eccentricity's 0/eps guard — consumers only read live slots)
    live = np.asarray(feats["area"]) > 0
    assert live.any()
    for k, v in feats.items():
        np.testing.assert_array_equal(got[k][live], np.asarray(v)[live])
        assert (got[k][~live] == 0).all()


class _DenseFake:
    """Segmenter whose windows are ~15% nonzero — overflows the first
    sparse label budget (n_px//32) at batch 4, forcing the dense-refetch
    fallback + ratchet in the drivers."""

    def __init__(self, input_size=256, max_instances=64):
        from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig

        self.cfg = HoverNeXtConfig(input_size=input_size)
        self.max_instances = max_instances

    def segment(self, tiles_u8):
        b, s, _, _ = np.asarray(tiles_u8).shape
        inst = np.zeros((b, s, s), np.int32)
        types = np.zeros((b, s, s), np.int32)
        inst[:, 30:130, 40:140] = 1  # 10,000 px ≈ 15% of 256²
        types[:, 30:130, 40:140] = 2
        return inst, types


@pytest.mark.parametrize("batch_size", [4])
def test_sliding_overflow_falls_back_dense(tmp_path, batch_size):
    from path_gene_multimodal_tpu.io.slide import synthetic_wsi
    from path_gene_multimodal_tpu.pipeline.nuclei_wsi import (
        load_instance_map,
        run_hovernext_wsi,
    )

    slide = synthetic_wsi(760, 760, seed=3)  # 3×3 window grid → 3 batches
    cfg = default_config()
    model = _DenseFake()
    map_path, nuclei = run_hovernext_wsi(
        slide, tmp_path, "s", model, cfg, batch_size=batch_size
    )
    # every interior window sees its own 100×100 block; the exactly-once
    # stitcher must keep one row per window-owned nucleus with exact area
    assert len(nuclei) > 0
    assert (nuclei["area"] == 10000.0).all()
    assert (nuclei["type"] == 2).all()
    inst_map = load_instance_map(map_path)
    # pixel-exact map through BOTH transports (overflowing batch = dense
    # refetch, later batches = ratcheted sparse)
    ids, counts = np.unique(inst_map[inst_map > 0], return_counts=True)
    assert len(ids) == len(nuclei)
    assert (counts == 10000).all()
