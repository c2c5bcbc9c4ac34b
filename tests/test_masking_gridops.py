"""Masking + grid ops vs golden numpy/scipy/colorsys implementations."""

import colorsys

import numpy as np
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.ops import gridops, masking


def test_rgb_to_hsv_matches_colorsys(rng):
    rgb = rng.integers(0, 256, size=(17, 13, 3), dtype=np.uint8)
    ours = np.asarray(masking.rgb_to_hsv(jnp.asarray(rgb)))
    for i in range(0, 17, 3):
        for j in range(0, 13, 2):
            r, g, b = rgb[i, j] / 255.0
            h, s, v = colorsys.rgb_to_hsv(r, g, b)
            np.testing.assert_allclose(ours[i, j], [h, s, v], atol=1e-5)


def test_otsu_bimodal(rng):
    # two well-separated modes → threshold lands between them
    lo = rng.normal(50, 5, size=2000).clip(0, 255)
    hi = rng.normal(200, 5, size=2000).clip(0, 255)
    img = np.concatenate([lo, hi]).astype(np.uint8).reshape(80, 50)
    t = int(masking.otsu_threshold(jnp.asarray(img)))
    # variance is flat across the histogram gap; argmax lands at its lower
    # edge (same behavior as skimage.threshold_otsu) — any t separating the
    # modes is correct
    assert 60 <= t <= 185
    fg = img > t
    assert fg.mean() == pytest.approx(0.5, abs=0.01)


def test_otsu_matches_bruteforce(rng):
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    t = int(masking.otsu_threshold(jnp.asarray(img)))
    # brute-force inter-class variance
    hist = np.bincount(img.reshape(-1), minlength=256).astype(np.float64)
    best, best_t = -1.0, 0
    bins = np.arange(256)
    for cand in range(256):
        w0 = hist[: cand + 1].sum()
        w1 = hist[cand + 1 :].sum()
        if w0 == 0 or w1 == 0:
            continue
        mu0 = (hist[: cand + 1] * bins[: cand + 1]).sum() / w0
        mu1 = (hist[cand + 1 :] * bins[cand + 1 :]).sum() / w1
        v = w0 * w1 * (mu0 - mu1) ** 2
        if v > best:
            best, best_t = v, cand
    assert t == best_t


def test_tissue_mask_separates_tissue(small_slide):
    thumb = small_slide.get_thumbnail((512, 512))
    mask = np.asarray(masking.tissue_mask(jnp.asarray(thumb)))
    # pink tissue is saturated, background is near-gray
    frac = mask.mean()
    assert 0.05 < frac < 0.9
    # background corner (synthetic slides keep margins blank-ish)
    assert mask[0, 0] == False  # noqa: E712


def test_median_blur(rng):
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    ours = np.asarray(masking.median_blur_3x3(jnp.asarray(img)))
    from scipy.ndimage import median_filter

    golden = median_filter(img, size=3, mode="nearest")
    np.testing.assert_array_equal(ours, golden)


def test_full_tile_grid():
    g = gridops.full_tile_grid(1000, 700, 224)
    assert g.shape == (4 * 3, 2)
    assert g[:, 0].max() == 3 * 224 and g[:, 1].max() == 2 * 224
    # row-major: first row has y=0
    assert (g[:4, 1] == 0).all()


def test_tile_foreground_fraction_exact():
    # mask at same resolution as tiles: scale=patch → 1 mask px per... use
    # scale 2: 4 mask px per tile with patch=4
    mask = np.zeros((8, 8), dtype=bool)
    mask[:4, :4] = True  # top-left quadrant fully on
    mask[:2, 4:8] = True  # top-right half on
    frac = np.asarray(gridops.tile_foreground_fraction(jnp.asarray(mask), patch_size=8, mask_scale=2.0))
    assert frac.shape == (2, 2)
    np.testing.assert_allclose(frac, [[1.0, 0.5], [0.0, 0.0]])


def test_infer_tile_size():
    coords = np.array([[0, 0], [224, 0], [448, 0], [0, 224], [672, 448]])
    assert gridops.infer_tile_size(coords) == 224
    assert gridops.infer_tile_size(np.array([[5, 5]])) == 224  # default


def test_rasterize_and_lookup_roundtrip(rng):
    coords = np.array([[0, 0], [224, 0], [448, 224], [224, 448]], dtype=np.int64)
    vals = rng.normal(size=(4, 5)).astype(np.float32)
    gw, gh, x0, y0 = gridops.tiles_to_grid_shape(coords, 224)
    assert (gw, gh) == (3, 3)
    grid = gridops.rasterize_tiles(jnp.asarray(coords), jnp.asarray(vals), gw, gh, x0, y0, 224)
    assert grid.shape == (3, 3, 5)
    back = np.asarray(gridops.grid_lookup(jnp.asarray(coords), grid, gw, gh, x0, y0, 224))
    np.testing.assert_allclose(back, vals)
    # empty cells keep fill
    assert np.all(np.asarray(grid)[2, 0] == 0)


def test_rasterize_drops_padding():
    coords = np.array([[0, 0], [-1, -1]], dtype=np.int64)  # second row = pad
    vals = jnp.asarray(np.array([1.0, 99.0], np.float32))
    grid = gridops.rasterize_tiles(jnp.asarray(coords), vals, 2, 2, 0, 0, 224)
    g = np.asarray(grid)
    assert g[0, 0] == 1.0
    assert not np.any(g == 99.0)


def test_canonical_padded_mask_matches_direct(rng):
    """Padded canonical-shape tissue_mask + edge-array tile fractions ==
    the direct per-shape path (the production tessellation route — one
    compiled program for every slide shape)."""
    import jax.numpy as jnp
    import numpy as np

    from path_gene_multimodal_tpu.ops import gridops, masking

    th, tw, S = 90, 140, 160
    thumb = (rng.random((th, tw, 3)) * 255).astype(np.uint8)
    thumb[:40, :60] = 230  # a saturated-ish block is irrelevant; any data

    direct = np.asarray(masking.tissue_mask(jnp.asarray(thumb)))
    padded = np.zeros((S, S, 3), np.uint8)
    padded[:th, :tw] = thumb
    canon = np.asarray(
        masking.tissue_mask(
            jnp.asarray(padded), valid_hw=jnp.asarray([th, tw], jnp.int32)
        )
    )
    # must match EVERYWHERE: the padding is filled with the last valid
    # row/col before the median blur, so even the border ring agrees with
    # the unpadded per-shape path
    np.testing.assert_array_equal(canon[:th, :tw], direct)
    assert not canon[th:, :].any() and not canon[:, tw:].any()

    mask_scale = 1000.0 / tw
    patch = 224
    ref = np.asarray(
        gridops.tile_foreground_fraction(jnp.asarray(direct), patch, mask_scale)
    )
    y0, y1, x0, x1, ny, nx = gridops.tile_edges_for_scale(th, tw, patch, mask_scale)
    pad1 = lambda e: np.pad(e, (0, S - len(e)))
    got = np.asarray(
        gridops.tile_foreground_fraction_edges(
            jnp.asarray(np.pad(direct, ((0, S - th), (0, S - tw)))),
            *(jnp.asarray(pad1(e)) for e in (y0, y1, x0, x1)),
        )
    )
    assert (ny, nx) == ref.shape
    np.testing.assert_allclose(got[:ny, :nx], ref, atol=1e-6)
    assert (got[ny:, :] == 0).all() and (got[:, nx:] == 0).all()
