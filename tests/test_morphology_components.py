"""Morphology + connected components vs scipy.ndimage goldens (with skimage
border semantics: dilation pads False, erosion pads True)."""

import numpy as np
import pytest
from scipy import ndimage as ndi

import jax.numpy as jnp

from path_gene_multimodal_tpu.ops import components as cc
from path_gene_multimodal_tpu.ops import morphology as morph


def _golden_dilate(mask, se):
    return ndi.binary_dilation(mask, structure=se.astype(bool), border_value=0)


def _golden_erode(mask, se):
    return ndi.binary_erosion(mask, structure=se.astype(bool), border_value=1)


@pytest.mark.parametrize("radius", [1, 2, 3])
def test_dilation_erosion_match_scipy(rng, radius):
    mask = rng.random((40, 56)) > 0.7
    se = morph.disk(radius)
    np.testing.assert_array_equal(
        np.asarray(morph.binary_dilation(jnp.asarray(mask), se)), _golden_dilate(mask, se)
    )
    np.testing.assert_array_equal(
        np.asarray(morph.binary_erosion(jnp.asarray(mask), se)), _golden_erode(mask, se)
    )


def test_closing_opening_match_scipy(rng):
    mask = rng.random((64, 48)) > 0.6
    se = morph.disk(1)
    ours_c = np.asarray(morph.binary_closing(jnp.asarray(mask), se))
    golden_c = _golden_erode(_golden_dilate(mask, se), se)
    np.testing.assert_array_equal(ours_c, golden_c)
    ours_o = np.asarray(morph.binary_opening(jnp.asarray(mask), se))
    golden_o = _golden_dilate(_golden_erode(mask, se), se)
    np.testing.assert_array_equal(ours_o, golden_o)


def test_batched_matches_single(rng):
    masks = rng.random((5, 32, 32)) > 0.6
    se = morph.disk(1)
    batched = np.asarray(morph.binary_closing(jnp.asarray(masks), se))
    for k in range(5):
        single = np.asarray(morph.binary_closing(jnp.asarray(masks[k]), se))
        np.testing.assert_array_equal(batched[k], single)


def test_border_preservation():
    """Foreground touching the border must survive closing (skimage pads
    erosion with True)."""
    mask = np.zeros((10, 10), bool)
    mask[0:3, 0:10] = True  # band on top edge
    se = morph.disk(2)
    out = np.asarray(morph.binary_closing(jnp.asarray(mask), se))
    assert out[0].all()


def test_gaussian_blur_matches_scipy(rng):
    img = rng.random((31, 45)).astype(np.float32)
    ours = np.asarray(morph.gaussian_blur(jnp.asarray(img), sigma=1.5))
    golden = ndi.gaussian_filter(img, sigma=1.5, mode="nearest", truncate=4.0)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def _golden_label(mask, connectivity):
    structure = (
        np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        if connectivity == 1
        else np.ones((3, 3))
    )
    lbl, n = ndi.label(mask, structure=structure)
    return lbl, n


def _same_partition(ours_compact, golden):
    """Label arrays agree up to renaming."""
    assert (ours_compact > 0).sum() == (golden > 0).sum()
    pairs = set(zip(ours_compact.reshape(-1).tolist(), golden.reshape(-1).tolist()))
    fg_pairs = [(a, b) for a, b in pairs if a > 0 or b > 0]
    a_to_b = {}
    b_to_a = {}
    for a, b in fg_pairs:
        assert (a > 0) == (b > 0)
        if a in a_to_b:
            assert a_to_b[a] == b
        if b in b_to_a:
            assert b_to_a[b] == a
        a_to_b[a] = b
        b_to_a[b] = a


@pytest.mark.parametrize("connectivity", [1, 2])
def test_label_matches_scipy(rng, connectivity):
    mask = rng.random((48, 64)) > 0.55
    ours, n_ours = cc.compact_labels(
        np.asarray(cc.label_components(jnp.asarray(mask), connectivity))
    )
    golden, n_golden = _golden_label(mask, connectivity)
    assert n_ours == n_golden
    _same_partition(ours, golden)


def test_label_spiral():
    """Nested spiral exercises multi-iteration propagation."""
    m = np.zeros((21, 21), bool)
    # draw a spiral path
    x, y = 10, 10
    m[y, x] = True
    step = 1
    dirs = [(0, 1), (1, 0), (0, -1), (-1, 0)]
    d = 0
    while step < 20:
        for _ in range(2):
            dy, dx = dirs[d % 4]
            for _ in range(step):
                x, y = x + dx, y + dy
                if 0 <= x < 21 and 0 <= y < 21:
                    m[y, x] = True
            d += 1
        step += 2
    ours, n = cc.compact_labels(np.asarray(cc.label_components(jnp.asarray(m), 1)))
    golden, n_golden = _golden_label(m, 1)
    assert n == n_golden == 1


def test_component_sizes(rng):
    mask = np.zeros((20, 20), bool)
    mask[2:5, 2:5] = True   # 9 px
    mask[10:12, 10:16] = True  # 12 px
    lbl = cc.label_components(jnp.asarray(mask), 1)
    sizes = np.asarray(cc.component_sizes(lbl))
    assert sizes[3, 3] == 9
    assert sizes[10, 12] == 12
    assert sizes[0, 0] == 0


def test_remove_small_objects_matches_skimage_semantics(rng):
    mask = rng.random((40, 40)) > 0.7
    ours = np.asarray(cc.remove_small_objects(jnp.asarray(mask), 5, 1))
    golden_lbl, n = _golden_label(mask, 1)
    golden = mask.copy()
    for k in range(1, n + 1):
        if (golden_lbl == k).sum() < 5:
            golden[golden_lbl == k] = False
    np.testing.assert_array_equal(ours, golden)


def test_remove_small_holes():
    mask = np.ones((15, 15), bool)
    mask[3:5, 3:5] = False    # 4-px hole → filled at threshold 5
    mask[8:12, 8:12] = False  # 16-px hole → kept
    out = np.asarray(cc.remove_small_holes(jnp.asarray(mask), 5, 1))
    assert out[3, 3] and out[4, 4]
    assert not out[9, 9]


def test_empty_and_full():
    empty = jnp.zeros((8, 8), bool)
    lbl, n = cc.compact_labels(np.asarray(cc.label_components(empty, 1)))
    assert n == 0 and (lbl == 0).all()
    full = jnp.ones((8, 8), bool)
    lbl, n = cc.compact_labels(np.asarray(cc.label_components(full, 1)))
    assert n == 1 and (lbl == 1).all()
