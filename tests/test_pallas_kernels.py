"""Pallas kernels (interpret mode on the CPU backend) vs XLA references."""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

import jax
import jax.numpy as jnp

from path_gene_multimodal_tpu.ops import watershed as ws
from path_gene_multimodal_tpu.ops.components import INF
from path_gene_multimodal_tpu.ops.pallas.flood import (
    pallas_marker_watershed,
    pallas_supported,
)


def test_pallas_not_supported_on_cpu():
    assert pallas_supported() is False  # tests run on the CPU backend


def test_pallas_flood_matches_xla(rng):
    b, h, w = 2, 48, 64
    dist = np.stack(
        [gaussian_filter(rng.random((h, w)).astype(np.float32), 3) for _ in range(b)]
    )
    dist = (dist - dist.min()) / (dist.max() - dist.min())
    mask = dist > 0.15
    markers = np.full((b, h, w), int(INF), np.int32)
    for bi in range(b):
        ys, xs = rng.integers(0, h, 6), rng.integers(0, w, 6)
        markers[bi, ys, xs] = np.arange(1, 7)
        markers[bi][~mask[bi]] = int(INF)
    xla = np.stack(
        [
            np.asarray(
                ws.marker_watershed(
                    jnp.asarray(dist[bi]), jnp.asarray(markers[bi]), jnp.asarray(mask[bi]),
                    levels=32,
                )
            )
            for bi in range(b)
        ]
    )
    pls = np.asarray(
        pallas_marker_watershed(
            jnp.asarray(dist), jnp.asarray(markers), jnp.asarray(mask),
            levels=32, interpret=True,
        )
    )
    np.testing.assert_array_equal(pls, xla)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_pallas_tiled_cc_matches_label_components(rng, connectivity):
    """Tiled Pallas CC (per-tile kernel + cross-tile merge) is bit-identical
    to the XLA label_components contract, including components spanning
    multiple tiles and non-tile-multiple shapes."""
    from path_gene_multimodal_tpu.ops.components import label_components
    from path_gene_multimodal_tpu.ops.pallas.cc import pallas_label_components_tiled

    h, w = 70, 90  # not multiples of the 32-px test tile
    mask = rng.random((h, w)) > 0.55
    # a snake that crosses every tile border several times
    mask[10, :] = True
    mask[:, 40] = True
    mask[50, 5:85] = True
    ref = np.asarray(label_components(jnp.asarray(mask), connectivity))
    got = np.asarray(
        pallas_label_components_tiled(
            jnp.asarray(mask), connectivity, tile=32, interpret=True
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_pallas_tiled_cc_degenerate(rng):
    from path_gene_multimodal_tpu.ops.components import label_components
    from path_gene_multimodal_tpu.ops.pallas.cc import pallas_label_components_tiled

    for mask in [np.zeros((40, 40), bool), np.ones((40, 40), bool)]:
        ref = np.asarray(label_components(jnp.asarray(mask), 1))
        got = np.asarray(
            pallas_label_components_tiled(jnp.asarray(mask), 1, tile=32, interpret=True)
        )
        np.testing.assert_array_equal(got, ref)


def test_remove_small_objects_pallas_parity(rng):
    """remove_small_objects(use_pallas=True) == XLA path (CPU interpret
    mode can't run the compiled kernel, so compare the labelers directly)."""
    from path_gene_multimodal_tpu.ops.components import (
        component_sizes,
        label_components,
    )
    from path_gene_multimodal_tpu.ops.pallas.cc import pallas_label_components_tiled

    mask = rng.random((100, 80)) > 0.6
    lbl_ref = label_components(jnp.asarray(mask), 1)
    lbl_pl = pallas_label_components_tiled(jnp.asarray(mask), 1, tile=32, interpret=True)
    keep_ref = np.asarray(mask & np.asarray(component_sizes(lbl_ref) >= 20))
    keep_pl = np.asarray(mask & np.asarray(component_sizes(lbl_pl) >= 20))
    np.testing.assert_array_equal(keep_pl, keep_ref)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_pallas_cc_sizes_matches_xla(rng, connectivity):
    """Fused CC+sizes kernel (interpret) == label_components +
    component_sizes, including multi-chunk components and empty tiles."""
    from path_gene_multimodal_tpu.ops.components import (
        component_sizes,
        label_components,
    )
    from path_gene_multimodal_tpu.ops.pallas.cc_sizes import pallas_cc_sizes

    b, h, w = 2, 32, 48
    mask = rng.random((b, h, w)) > 0.6
    mask[0, 5, :] = True  # a row crossing every chunk
    mask[1] = False       # empty tile
    lbl, sizes, _ = pallas_cc_sizes(
        jnp.asarray(mask), connectivity, s_slots=256, chunk=8, interpret=True
    )
    for bi in range(b):
        ref_l = label_components(jnp.asarray(mask[bi]), connectivity)
        np.testing.assert_array_equal(np.asarray(lbl[bi]), np.asarray(ref_l))
        np.testing.assert_array_equal(
            np.asarray(sizes[bi]), np.asarray(component_sizes(ref_l))
        )


def test_pallas_cc_sizes_slot_overflow(rng):
    """Components beyond s_slots get size 0 (documented degradation)."""
    from path_gene_multimodal_tpu.ops.pallas.cc_sizes import pallas_cc_sizes

    mask = np.zeros((1, 16, 16), bool)
    mask[0, ::2, ::2] = True  # 64 isolated pixels
    _, sizes, _ = pallas_cc_sizes(
        jnp.asarray(mask), 1, s_slots=16, chunk=8, interpret=True
    )
    s = np.asarray(sizes[0])[mask[0]]
    assert (s == 1).sum() == 16 and (s == 0).sum() == 48


def test_hover_instances_batch_pallas_sizes_path(rng):
    """use_pallas=True watershed (with the fused CC+sizes kernel,
    interpret-incompatible parts aside) == use_pallas=False on CPU via
    the components only — full-path equality is covered on TPU."""
    from path_gene_multimodal_tpu.ops.components import (
        component_sizes,
        label_components,
    )
    from path_gene_multimodal_tpu.ops.pallas.cc_sizes import pallas_cc_sizes

    mask = rng.random((3, 64, 64)) > 0.7
    # s_slots must cover the component count (speckle masks can exceed
    # 512 in 64² — the documented overflow would zero their sizes)
    lbl, sizes, _ = pallas_cc_sizes(jnp.asarray(mask), 1, s_slots=2048, interpret=True)
    for bi in range(3):
        ref_l = label_components(jnp.asarray(mask[bi]), 1)
        keep_ref = np.asarray(mask[bi]) & (np.asarray(component_sizes(ref_l)) >= 10)
        keep_got = np.asarray(mask[bi]) & (np.asarray(sizes[bi]) >= 10)
        np.testing.assert_array_equal(keep_got, keep_ref)


def test_hover_dense_flood_matches_compacted(rng):
    """dense=True watershed (flooding pre-compacted marker ids) ==
    compact_labels_device(min-index flood) — same partition, same 1..N
    ordering (by root pixel index)."""
    from path_gene_multimodal_tpu.ops.instances import compact_labels_device
    from tests.test_hovernext import _two_blob_fixture

    np_prob, hv, _ = _two_blob_fixture()
    np_b = jnp.asarray(np.stack([np_prob, np_prob]))
    hv_b = jnp.asarray(np.stack([hv, hv]))
    lbl_min = ws.hover_instances_batch(np_b, hv_b, use_pallas=True, interpret=True)
    ref = np.asarray(compact_labels_device(lbl_min))
    lbl_dense = ws.hover_instances_batch(
        np_b, hv_b, use_pallas=True, dense=True, interpret=True
    )
    got = np.asarray(jnp.where(lbl_dense < 2**30, lbl_dense, 0)).astype(np.uint16)
    np.testing.assert_array_equal(got, ref)


def test_instance_stats_pallas_matches_scatter(rng):
    """One-hot-matmul instance stats (interpret) == the scatter path, on a
    workload with multi-strip instances, types, and empty slots."""
    from path_gene_multimodal_tpu.ops.instances import instance_features_batch
    from path_gene_multimodal_tpu.ops.pallas.instance_stats import (
        features_from_stats,
        instance_stats_pallas,
        stats_center,
    )

    b, s, max_inst = 2, 64, 32
    lbl = np.zeros((b, s, s), np.int32)
    tp = np.zeros((b, s, s), np.int32)
    for bi in range(b):
        for inst in range(1, 20):
            cy, cx = rng.integers(4, s - 4, 2)
            r = int(rng.integers(2, 6))
            yy, xx = np.mgrid[0:s, 0:s]
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            lbl[bi][m] = inst
            tp[bi][m] = int(rng.integers(1, 6))
    # an id beyond max_instances must be dropped in both paths
    lbl[0, 0:2, 0:2] = max_inst + 5

    ref = instance_features_batch(
        jnp.asarray(lbl), jnp.asarray(tp), max_instances=max_inst
    )
    sums, mins = instance_stats_pallas(
        jnp.asarray(lbl), jnp.asarray(tp), max_inst, interpret=True
    )
    got = features_from_stats(sums, mins, num_types=6, center=stats_center(s, s))
    assert set(got) == set(ref)
    for k in ref:
        if k == "orientation":
            continue  # checked below where it is well-defined
        # the scatter path shifts by the exact per-instance centroid, the
        # one-pass kernel by the tile center — the residual f32 conditioning
        # gap shows up only in the eigen-derived keys (ecc is sensitive when
        # lam2/lam1 is tiny); raw stats must still agree tightly
        tol = 1e-2 if k in ("eccentricity", "major_axis", "minor_axis") else 1e-3
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=tol, rtol=1e-4,
            err_msg=k,
        )
    # orientation is ill-defined for near-circular instances (this fixture
    # is discs: mu_xx≈mu_yy, mu_xy≈0 and noise flips atan2 by ±π/2) —
    # compare modulo π only where the eigenvalue gap makes it meaningful
    ecc = np.asarray(ref["eccentricity"])
    sel = ecc > 0.5
    dang = np.abs(np.asarray(got["orientation"]) - np.asarray(ref["orientation"]))
    dang = np.minimum(dang, np.abs(dang - np.pi))
    assert (dang[sel] < 0.05).all()


def test_instance_stats_pallas_empty(rng):
    from path_gene_multimodal_tpu.ops.instances import instance_features_batch
    from path_gene_multimodal_tpu.ops.pallas.instance_stats import (
        features_from_stats,
        instance_stats_pallas,
        stats_center,
    )

    lbl = np.zeros((1, 32, 32), np.int32)
    tp = np.zeros((1, 32, 32), np.int32)
    ref = instance_features_batch(jnp.asarray(lbl), jnp.asarray(tp), max_instances=16)
    sums, mins = instance_stats_pallas(jnp.asarray(lbl), jnp.asarray(tp), 16, interpret=True)
    got = features_from_stats(sums, mins, num_types=6, center=stats_center(32, 32))
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]), atol=1e-4, err_msg=k)


def test_hover_instances_batch_consistent(rng):
    """Batched postproc (XLA path) == per-tile hover_instances."""
    from tests.test_hovernext import _two_blob_fixture

    np_prob, hv, _ = _two_blob_fixture()
    batch_p = jnp.asarray(np.stack([np_prob, np_prob]))
    batch_h = jnp.asarray(np.stack([hv, hv]))
    batched = np.asarray(ws.hover_instances_batch(batch_p, batch_h))
    single = np.asarray(ws.hover_instances(jnp.asarray(np_prob), jnp.asarray(hv)))
    np.testing.assert_array_equal(batched[0], single)
    np.testing.assert_array_equal(batched[1], single)


def test_cc_sizes_adaptive_overflow_path(rng):
    """Adaptive slot budget: a tile with more components than `small`
    takes the big path and matches the direct big-S result; a normal tile
    stays on the small path with identical outputs."""
    from path_gene_multimodal_tpu.ops.pallas.cc_sizes import (
        pallas_cc_sizes,
        pallas_cc_sizes_adaptive,
    )

    # 64 isolated pixels > small=16 → overflow
    mask = np.zeros((1, 16, 16), bool)
    mask[0, ::2, ::2] = True
    la, sa, da = pallas_cc_sizes_adaptive(
        jnp.asarray(mask), 1, min_size=1, small=16, big=128, interpret=True
    )
    lb, sb, db = pallas_cc_sizes(
        jnp.asarray(mask), 1, s_slots=128, min_size=1, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    np.testing.assert_array_equal(np.asarray(da), np.asarray(db))

    # two blobs < small → small path, same answers
    mask2 = np.zeros((1, 16, 16), bool)
    mask2[0, 2:6, 2:6] = True
    mask2[0, 10:14, 9:15] = True
    la2, sa2, da2 = pallas_cc_sizes_adaptive(
        jnp.asarray(mask2), 1, min_size=1, small=16, big=128, interpret=True
    )
    lb2, sb2, db2 = pallas_cc_sizes(
        jnp.asarray(mask2), 1, s_slots=128, min_size=1, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(sa2), np.asarray(sb2))
    np.testing.assert_array_equal(np.asarray(da2), np.asarray(db2))


def test_cc_sizes_adaptive_overflow_counter():
    """`count_overflow=True` surfaces the tiles whose component count
    exceeds even `big` (those components silently get size 0 — the
    no-silent-caps counter from the r2 verdict)."""
    from path_gene_multimodal_tpu.ops.pallas.cc_sizes import pallas_cc_sizes_adaptive

    # 64 isolated pixels > big=32 → 1 overflowing tile; second tile clean
    mask = np.zeros((2, 16, 16), bool)
    mask[0, ::2, ::2] = True
    mask[1, 2:6, 2:6] = True
    _, _, _, over = pallas_cc_sizes_adaptive(
        jnp.asarray(mask), 1, min_size=1, small=16, big=32, interpret=True,
        count_overflow=True,
    )
    # per-tile mask (so multi-pass callers can OR before counting)
    np.testing.assert_array_equal(np.asarray(over), [True, False])

    _, _, _, over2 = pallas_cc_sizes_adaptive(
        jnp.asarray(mask), 1, min_size=1, small=16, big=128, interpret=True,
        count_overflow=True,
    )
    assert not np.asarray(over2).any()
