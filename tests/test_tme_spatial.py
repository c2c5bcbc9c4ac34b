"""TME ROI geometry vs brute-force Euclidean golden + spatial-join stage
(reference load_annotation_with_coordinates.py semantics, incl. the 508-px
patch-size quirk and round-buffer corner behavior)."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.core.artifacts import write_tessellation_h5
from path_gene_multimodal_tpu.ops.tme import min_box_distance_sq, tme_roi_flags
from path_gene_multimodal_tpu.pipeline.spatial import load_annotations_with_coords


def _golden_rect_dist(a, b, size):
    """Brute-force rect-to-rect distance (shapely box().distance semantics)."""
    dx = max(0.0, max(b[0] - (a[0] + size), a[0] - (b[0] + size)))
    dy = max(0.0, max(b[1] - (a[1] + size), a[1] - (b[1] + size)))
    return np.hypot(dx, dy)


def test_min_box_distance_matches_bruteforce(rng):
    tiles = rng.uniform(0, 5000, size=(40, 2)).astype(np.float32)
    tumors = rng.uniform(0, 5000, size=(17, 2)).astype(np.float32)
    size = 508.0
    d2 = np.asarray(min_box_distance_sq(jnp.asarray(tiles), jnp.asarray(tumors), size))
    golden = np.array(
        [min(_golden_rect_dist(t, b, size) for b in tumors) for t in tiles]
    )
    np.testing.assert_allclose(np.sqrt(d2), golden, rtol=1e-5, atol=1e-2)


def test_chunking_boundary(rng):
    """Tumor count > chunk exercises the scan path."""
    tiles = rng.uniform(0, 100000, size=(64, 2)).astype(np.float32)
    tumors = rng.uniform(0, 100000, size=(1100, 2)).astype(np.float32)
    d2_scan = np.asarray(min_box_distance_sq(jnp.asarray(tiles), jnp.asarray(tumors), 224.0, chunk=512))
    d2_one = np.asarray(min_box_distance_sq(jnp.asarray(tiles), jnp.asarray(tumors), 224.0, chunk=2048))
    np.testing.assert_allclose(d2_scan, d2_one, rtol=1e-6)


def test_round_buffer_corner_semantics():
    """Diagonal corner case: Euclidean (round buffer) excludes what a square
    (Chebyshev) buffer would include — must match shapely's round buffer."""
    size, margin = 508.0, 1016.0
    tumor = np.array([[0.0, 0.0]], np.float32)
    # diagonal gap: dx = dy = 760 → hypot = 1074.8 > 1016 (excluded)
    #               dx = dy = 700 → hypot = 989.9  < 1016 (included)
    tiles = np.array(
        [[508 + 760, 508 + 760], [508 + 700, 508 + 700], [508 + 1015, 0.0]], np.float32
    )
    d2 = np.asarray(min_box_distance_sq(jnp.asarray(tiles), jnp.asarray(tumor), size))
    d = np.sqrt(d2)
    assert d[0] > margin      # round buffer excludes
    assert d[1] < margin      # included
    assert d[2] < margin      # axis-aligned within margin


def test_tme_flags_overlap_is_zero():
    tiles = np.array([[0, 0], [100, 100]], np.float32)
    d2 = np.asarray(min_box_distance_sq(jnp.asarray(tiles), jnp.asarray(tiles[:1]), 508.0))
    assert d2[0] == 0.0 and d2[1] == 0.0  # overlapping boxes → distance 0


def test_tme_no_tumor_raises():
    tiles = np.zeros((3, 2), np.float32)
    with pytest.raises(ValueError, match="No tumor tiles"):
        tme_roi_flags(tiles, np.zeros(3, bool), np.ones(3, bool), 508.0, 1016.0)


@pytest.fixture
def spatial_setup(tmp_path):
    cfg = default_config()
    classes = list(cfg.classes)
    # 6x6 grid of 224px tiles; put "tumor" top-left corner, far tile bottom-right
    coords = np.array([[x * 224, y * 224] for y in range(10) for x in range(10)], np.int64)
    n = len(coords)
    # deterministic: every tile → class 2 (TILs, not a tumor class), except
    # tile 0 → class 0 (the only tumor seed) and tile 99 → class 4 (necrosis)
    scores = np.full((n, 5), 0.05, np.float32)
    scores[:, 2] = 0.5
    scores[0] = [0.9, 0.05, 0.05, 0.05, 0.05]
    scores[99] = [0.05, 0.05, 0.05, 0.05, 0.9]
    write_tessellation_h5(tmp_path / "s.h5", coords, tile_size=224)
    df = pd.DataFrame(scores, columns=classes)
    df.insert(0, "tile_index", np.arange(n))
    df.to_csv(tmp_path / "s_annotations.csv", index=False)
    return tmp_path, cfg, classes, coords, scores


def test_spatial_join_schema(spatial_setup):
    tmp_path, cfg, classes, coords, scores = spatial_setup
    out = load_annotations_with_coords(
        tmp_path / "s_annotations.csv", tmp_path / "s.h5", classes,
        list(cfg.tme_classes), tmp_path, "s",
    )
    for col in ["tile_index", "x", "y", "predicted_class", "in_tme_roi"]:
        assert col in out.columns
    np.testing.assert_array_equal(out["x"].to_numpy(), coords[:, 0])
    np.testing.assert_array_equal(out["y"].to_numpy(), coords[:, 1])
    assert (tmp_path / "s_annotations_with_coords.csv").exists()
    # predicted_class argmax parity with pandas idxmax
    assert out.loc[0, "predicted_class"] == classes[0]
    assert out.loc[99, "predicted_class"] == classes[4]


def test_spatial_join_tme_roi_508_quirk(spatial_setup):
    """ROI must use 508-px boxes + 1016 margin (reference quirk), so the
    reach from the tumor tile at (0,0) is 508+1016 = 1524 px in each axis."""
    tmp_path, cfg, classes, coords, scores = spatial_setup
    out = load_annotations_with_coords(
        tmp_path / "s_annotations.csv", tmp_path / "s.h5", classes,
        list(cfg.tme_classes), tmp_path, "s",
    )
    golden = []
    for x, y in coords:
        d = _golden_rect_dist((0.0, 0.0), (float(x), float(y)), 508.0)
        golden.append(d <= 1016.0)
    np.testing.assert_array_equal(out["in_tme_roi"].to_numpy(), np.array(golden))
    # sanity: ROI is a strict subset (far corner out, neighbors in)
    assert out["in_tme_roi"].iloc[0]
    assert not out["in_tme_roi"].iloc[99]


def test_spatial_join_missing_tile_index_uses_row_order(spatial_setup):
    tmp_path, cfg, classes, coords, scores = spatial_setup
    df = pd.read_csv(tmp_path / "s_annotations.csv").drop(columns=["tile_index"])
    df.to_csv(tmp_path / "noidx.csv", index=False)
    out = load_annotations_with_coords(
        tmp_path / "noidx.csv", tmp_path / "s.h5", classes,
        list(cfg.tme_classes), tmp_path, "s", save_merged=False,
    )
    np.testing.assert_array_equal(out["tile_index"].to_numpy(), np.arange(100))


def test_spatial_join_missing_class_column(spatial_setup):
    tmp_path, cfg, classes, coords, scores = spatial_setup
    df = pd.read_csv(tmp_path / "s_annotations.csv").drop(columns=[classes[2]])
    df.to_csv(tmp_path / "short.csv", index=False)
    with pytest.raises(KeyError, match="Missing class score columns"):
        load_annotations_with_coords(
            tmp_path / "short.csv", tmp_path / "s.h5", classes,
            list(cfg.tme_classes), tmp_path, "s", save_merged=False,
        )


def test_spatial_join_png_paths(spatial_setup):
    tmp_path, cfg, classes, coords, scores = spatial_setup
    (tmp_path / "patches").mkdir()
    out = load_annotations_with_coords(
        tmp_path / "s_annotations.csv", tmp_path / "s.h5", classes,
        list(cfg.tme_classes), tmp_path, "s", save_merged=False,
    )
    assert out.loc[7, "png_path"].endswith(f"patches/{coords[7,0]}_{coords[7,1]}.png")
