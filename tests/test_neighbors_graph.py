"""Neighbor search vs scipy cKDTree goldens + cell-graph construction."""

import numpy as np
import pandas as pd
import pytest
from scipy.spatial import cKDTree

from path_gene_multimodal_tpu.config import GraphConfig
from path_gene_multimodal_tpu.ops import neighbors
from path_gene_multimodal_tpu.ops.neighbors import combined_graphs, knn, radius_graph
from path_gene_multimodal_tpu.pipeline.graph import (
    build_cell_graph,
    morphology_features,
    to_networkx,
    to_pyg_data,
)


def test_knn_matches_ckdtree(rng):
    pts = rng.uniform(0, 1000, size=(500, 2)).astype(np.float32)
    d, i = knn(pts, k=5)
    tree = cKDTree(pts)
    gd, gi = tree.query(pts, k=6)  # self + 5
    np.testing.assert_allclose(np.sort(d, axis=1), np.sort(gd[:, 1:], axis=1), rtol=1e-4, atol=1e-2)
    # neighbor sets match (ties may reorder)
    for r in range(0, 500, 37):
        assert set(i[r]) == set(gi[r, 1:]), r


def test_knn_chunked_consistency(rng):
    pts = rng.uniform(0, 100, size=(300, 2)).astype(np.float32)
    d1, i1 = knn(pts, k=3, q_chunk=64, db_chunk=128)
    d2, i2 = knn(pts, k=3, q_chunk=512, db_chunk=512)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-3)


def test_knn_single_point_sentinel():
    """Advisor regression: n=1 with include_self=False must return the -1
    sentinel (not the self index 0 surviving the inf push + re-sort)."""
    d, i = knn(np.array([[5.0, 5.0]], np.float32), k=5)
    assert i.shape == (1, 1)
    assert i[0, 0] == -1
    assert np.isinf(d[0, 0])


def test_radius_graph_matches_ckdtree(rng):
    pts = rng.uniform(0, 200, size=(300, 2)).astype(np.float32)
    r = 15.0
    ei, ed = radius_graph(pts, radius=r, max_degree=64)
    tree = cKDTree(pts)
    pairs = tree.query_pairs(r, output_type="ndarray")
    golden = set()
    for a, b in pairs:
        golden.add((a, b))
        golden.add((b, a))
    ours = set(zip(ei[0].tolist(), ei[1].tolist()))
    assert ours == golden
    # distances correct
    for (a, b), dist in zip(zip(ei[0], ei[1]), ed):
        assert dist == pytest.approx(np.linalg.norm(pts[a] - pts[b]), rel=1e-4, abs=1e-2)


def test_combined_graphs_matches_separate(rng):
    """combined_graphs (one device query) == knn + radius_graph run
    separately, edge set compared order-insensitively."""
    pts = rng.uniform(0, 800, size=(400, 2)).astype(np.float32)
    d1, i1 = knn(pts, k=5)
    ei1, ed1 = radius_graph(pts, radius=60.0, max_degree=64)
    d2, i2, ei2, ed2 = combined_graphs(pts, k=5, radius=60.0, max_degree=64)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(i1, i2)
    assert ei1.shape == ei2.shape
    e1 = set(map(tuple, ei1.T.tolist()))
    e2 = set(map(tuple, ei2.T.tolist()))
    assert e1 == e2
    np.testing.assert_allclose(sorted(ed1), sorted(ed2), rtol=1e-5, atol=1e-3)


def test_device_path_matches_host_tree(rng, monkeypatch):
    """The chunked device scan (used above HOST_TREE_MAX_N) returns the
    same neighbor sets as the host cKDTree fast path."""
    import path_gene_multimodal_tpu.ops.neighbors as nb

    pts = rng.uniform(0, 500, size=(300, 2)).astype(np.float32)
    d_h, i_h = knn(pts, k=4)
    ei_h, ed_h = radius_graph(pts, radius=50.0, max_degree=32)
    monkeypatch.setattr(nb, "HOST_TREE_MAX_N", 0)  # force device path
    d_d, i_d = knn(pts, k=4)
    ei_d, ed_d = radius_graph(pts, radius=50.0, max_degree=32)
    np.testing.assert_allclose(d_d, d_h, rtol=1e-5, atol=1e-3)
    for r in range(0, 300, 17):  # ties may reorder — compare sets
        assert set(i_d[r]) == set(i_h[r]), r
    assert set(map(tuple, ei_d.T.tolist())) == set(map(tuple, ei_h.T.tolist()))


def test_cell_budget_routes_wide_queries_to_device(rng, monkeypatch):
    """Explicitly-capped WIDE queries (n·kk over HOST_TREE_CELL_BUDGET)
    take the device path — the host tree's (n, kk) transients scale with
    the cap, not the point count — with identical results."""
    import path_gene_multimodal_tpu.ops.neighbors as nb

    pts = rng.uniform(0, 500, size=(300, 2)).astype(np.float32)
    ei_h, ed_h = radius_graph(pts, radius=50.0, max_degree=32)
    monkeypatch.setattr(nb, "HOST_TREE_CELL_BUDGET", 1)  # every query "wide"
    ei_d, ed_d = radius_graph(pts, radius=50.0, max_degree=32)
    assert set(map(tuple, ei_d.T.tolist())) == set(map(tuple, ei_h.T.tolist()))
    np.testing.assert_allclose(sorted(ed_d), sorted(ed_h), rtol=1e-5, atol=1e-3)


def test_uncapped_radius_matches_ball_query(rng):
    """max_degree=None (the default) returns EVERY within-radius edge —
    the reference's unbounded cKDTree ball query — even where local
    density exceeds the old 64-neighbor cap."""
    # a dense cluster: 120 points inside one radius of each other
    cluster = rng.uniform(0, 10, size=(120, 2)).astype(np.float32)
    rest = rng.uniform(100, 400, size=(80, 2)).astype(np.float32)
    pts = np.concatenate([cluster, rest])
    tree = cKDTree(pts)
    pairs = tree.query_pairs(30.0)
    n_ref = 2 * len(pairs)
    ei, ed = radius_graph(pts, radius=30.0)  # default: uncapped
    assert ei.shape[1] == n_ref
    e_ref = set()
    for a, b in pairs:
        e_ref.add((a, b))
        e_ref.add((b, a))
    assert set(map(tuple, ei.T.tolist())) == e_ref
    # combined_graphs default is uncapped too
    _, _, ei2, _ = combined_graphs(pts, k=5, radius=30.0)
    assert set(map(tuple, ei2.T.tolist())) == e_ref
    # the capped mode still truncates (old behavior, explicit opt-in)
    ei_cap, _ = radius_graph(pts, radius=30.0, max_degree=16)
    assert ei_cap.shape[1] < n_ref


def test_knn_empty():
    d, i = neighbors.knn(np.zeros((0, 2), np.float32), k=5)
    assert d.shape == (0, 5) and i.shape == (0, 5)


def test_device_path_shape_bucketing(rng, monkeypatch):
    """Different slide sizes must REUSE the compiled kNN program: the db is
    bucketed to db_chunk multiples and queries to q_chunk, with the true
    count as a traced scalar (a per-n program costs minutes of compile per
    slide over a tunnel)."""
    monkeypatch.setattr(neighbors, "HOST_TREE_MAX_N", 0)  # force device path
    base = neighbors._knn_filtered._cache_size()
    outs = {}
    for n in (100, 150, 130):  # same 256-bucket, different true n
        pts = rng.random((n, 2)).astype(np.float32) * 1000
        d, i = neighbors.knn(pts, k=5, q_chunk=64, db_chunk=256)
        outs[n] = (d, i)
        assert i.shape == (n, 5)
    assert neighbors._knn_filtered._cache_size() - base == 1
    # and the bucketed result is still exact vs the host tree
    from scipy.spatial import cKDTree

    pts = rng.random((130, 2)).astype(np.float32) * 1000
    d, i = neighbors.knn(pts, k=5, q_chunk=64, db_chunk=256)
    dt, it = cKDTree(pts).query(pts, k=6)
    np.testing.assert_array_equal(i, it[:, 1:6])
    np.testing.assert_allclose(d, dt[:, 1:6].astype(np.float32), rtol=1e-5)


def test_combined_graphs_empty():
    d, i, ei, ed = combined_graphs(np.zeros((0, 2), np.float32))
    assert d.shape[0] == 0 and ei.shape == (2, 0)


def test_radius_graph_empty():
    pts = np.array([[0, 0], [1000, 1000]], np.float32)
    ei, ed = radius_graph(pts, radius=5.0)
    assert ei.shape == (2, 0) and len(ed) == 0


@pytest.fixture
def nuclei_df(rng):
    n = 60
    rows = []
    for i in range(n):
        rows.append(
            {
                "nuc_id": f"n{i}",
                "type": int(rng.integers(1, 6)),
                "wsi_centroid_x": float(rng.uniform(0, 4000)),
                "wsi_centroid_y": float(rng.uniform(0, 4000)),
                "area": float(rng.uniform(40, 200)),
                "perimeter": float(rng.uniform(20, 70)),
                "eccentricity": float(rng.uniform(0, 0.9)),
                "solidity": float(rng.uniform(0.7, 1.0)),
                "major_axis_length": float(rng.uniform(8, 20)),
                "minor_axis_length": float(rng.uniform(4, 10)),
                "orientation": float(rng.uniform(-1.5, 1.5)),
            }
        )
    return pd.DataFrame(rows)


def test_morphology_features_zscored(nuclei_df):
    z, names = morphology_features(nuclei_df)
    assert z.shape == (60, 11)
    assert len(names) == 11 and names[0] == "area_z"
    np.testing.assert_allclose(z.mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(z.std(axis=0), 1, atol=1e-4)


def test_build_cell_graph(nuclei_df, tmp_path):
    g = build_cell_graph(nuclei_df, GraphConfig(), tmp_path, "s")
    assert g.x.shape == (60, 5 + 11)
    assert g.knn_index.shape == (60, 5)
    # µm conversion + median centering
    assert np.abs(np.median(g.pos_um, axis=0)).max() < 1e-9
    span = g.pos_um.max() - g.pos_um.min()
    assert span < 4000 * 0.25 * 1.1  # µm scale, not px
    assert (tmp_path / "s_cell_graph.npz").exists()
    with np.load(tmp_path / "s_cell_graph.npz", allow_pickle=False) as z:
        assert z["edge_index"].shape[0] == 2
        assert z["x"].shape == (60, 16)


def test_type_filter(nuclei_df):
    g = build_cell_graph(nuclei_df, GraphConfig(), None, "s",
                         type_filter=(1, 2), write_artifacts=False)
    assert set(np.unique(g.types)).issubset({1, 2})


def test_to_networkx(nuclei_df):
    g = build_cell_graph(nuclei_df, GraphConfig(), None, "s", write_artifacts=False)
    nx_g = to_networkx(g)
    assert nx_g.number_of_nodes() == 60
    assert nx_g.number_of_edges() > 0
    node = list(nx_g.nodes(data=True))[0]
    assert "pos" in node[1] and "cell_type" in node[1]


def test_to_pyg_data_fallback(nuclei_df):
    g = build_cell_graph(nuclei_df, GraphConfig(), None, "s", write_artifacts=False)
    data = to_pyg_data(g)
    # torch_geometric absent in this env → dict with the Data contract keys
    if isinstance(data, dict):
        assert set(data) == {"x", "edge_index", "edge_attr", "pos"}
    else:
        assert data.x.shape[0] == 60


def test_empty_raises():
    with pytest.raises(ValueError, match="no nuclei"):
        build_cell_graph(pd.DataFrame({"type": []}), GraphConfig(), None, "s",
                         write_artifacts=False)


def test_radius_cap_warning_device_path(monkeypatch):
    """max_degree=None above HOST_TREE_MAX_N falls to the capped device
    path — the probe column must turn the silent degree cap into a logged
    warning (r2 advisor medium), and edges stay nearest-first-capped."""
    import logging

    from path_gene_multimodal_tpu.ops import neighbors as nb
    from path_gene_multimodal_tpu.utils.log import get_logger

    monkeypatch.setattr(nb, "HOST_TREE_MAX_N", 0)  # force the device path
    monkeypatch.setattr(nb, "DEVICE_RADIUS_CAP", 16)  # small cap for speed
    rng = np.random.default_rng(0)
    pts = rng.random((40, 2)).astype(np.float32) * 3.0  # all within r=10

    records = []
    handler = logging.Handler()
    handler.emit = records.append
    logger = get_logger()
    logger.addHandler(handler)
    try:
        ei, ed = nb.radius_graph(pts, radius=10.0)
    finally:
        logger.removeHandler(handler)
    warned = [r for r in records if "degree cap" in r.getMessage()]
    assert warned, "expected a degree-cap warning on the device path"
    assert "40/40" in warned[0].getMessage()
    # every node capped at 16 nearest-first edges
    src_counts = np.bincount(ei[0], minlength=40)
    assert (src_counts == 16).all()

    # combined_graphs warns through the same probe
    records.clear()
    logger.addHandler(handler)
    try:
        _, _, ei2, _ = nb.combined_graphs(pts, k=3, radius=10.0)
    finally:
        logger.removeHandler(handler)
    assert any("degree cap" in r.getMessage() for r in records)

    # an explicit max_degree opts into capping: no warning
    records.clear()
    logger.addHandler(handler)
    try:
        nb.radius_graph(pts, radius=10.0, max_degree=16)
    finally:
        logger.removeHandler(handler)
    assert not any("degree cap" in r.getMessage() for r in records)
