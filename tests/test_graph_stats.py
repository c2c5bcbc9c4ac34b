"""Stage-6 spatial graph analysis (pipeline/graph_stats.py) vs independent
goldens: networkx for degree/clustering, dense eigendecomposition for
centrality, brute-force loops for composition / interaction counts /
tumor-immune metrics."""

import json

import numpy as np
import pandas as pd
import pytest

from path_gene_multimodal_tpu.config import TYPE_NAMES, GraphConfig
from path_gene_multimodal_tpu.pipeline.graph import build_cell_graph
from path_gene_multimodal_tpu.pipeline.graph_stats import (
    adjacency,
    analyze_graph,
    clustering_coefficients,
    degrees,
    eigenvector_centrality,
    interaction_enrichment,
    neighborhood_composition,
    tumor_immune_metrics,
)


def _random_edge_index(rng, n, n_edges):
    """Random undirected graph as a both-directions (2, E) edge list (the
    ops.neighbors.radius_graph convention), with duplicates + self loops
    thrown in to prove the adjacency builder cleans them."""
    src = rng.integers(0, n, size=n_edges)
    dst = rng.integers(0, n, size=n_edges)
    ei = np.stack([np.r_[src, dst, src[:3], [0]], np.r_[dst, src, dst[:3], [0]]])
    return ei.astype(np.int64)


def _nx_graph(a):
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(range(a.shape[0]))
    coo = a.tocoo()
    g.add_edges_from(
        (int(i), int(j)) for i, j in zip(coo.row, coo.col) if i < j
    )
    return g


def test_adjacency_symmetric_dedup(rng):
    n = 40
    ei = _random_edge_index(rng, n, 120)
    a = adjacency(ei, n)
    assert (a != a.T).nnz == 0          # symmetric
    assert a.diagonal().sum() == 0      # no self loops
    assert set(np.unique(a.data)) == {1.0}  # binarized


def test_degree_clustering_match_networkx(rng):
    nx = pytest.importorskip("networkx")
    n = 60
    a = adjacency(_random_edge_index(rng, n, 150), n)
    g = _nx_graph(a)
    deg = degrees(a)
    nx_deg = np.array([g.degree(i) for i in range(n)])
    np.testing.assert_array_equal(deg, nx_deg)
    clust = clustering_coefficients(a)
    nx_clust = np.array([nx.clustering(g, i) for i in range(n)])
    np.testing.assert_allclose(clust, nx_clust, atol=1e-12)
    # row-chunked product is exact, chunk boundary mid-matrix
    np.testing.assert_allclose(
        clustering_coefficients(a, row_chunk=17), clust, atol=1e-12
    )


def test_eigenvector_centrality_matches_dense_eig(rng):
    n = 50
    a = adjacency(_random_edge_index(rng, n, 400), n)  # dense-ish: connected
    c = eigenvector_centrality(a)
    w, v = np.linalg.eigh(a.toarray())
    golden = np.abs(v[:, np.argmax(w)])
    np.testing.assert_allclose(np.abs(c), golden, atol=1e-6)


def test_neighborhood_composition_brute_force(rng):
    n = 50
    a = adjacency(_random_edge_index(rng, n, 130), n)
    types = rng.integers(1, 6, size=n).astype(np.int32)
    comp = neighborhood_composition(a, types)
    k = max(TYPE_NAMES)
    dense = a.toarray()
    for i in range(n):
        nbrs = np.nonzero(dense[i])[0]
        if len(nbrs) == 0:
            np.testing.assert_array_equal(comp[i], np.zeros(k))
            continue
        want = np.array([(types[nbrs] == t + 1).mean() for t in range(k)])
        np.testing.assert_allclose(comp[i], want, atol=1e-12)


def test_interaction_counts_brute_force(rng):
    n = 60
    a = adjacency(_random_edge_index(rng, n, 200), n)
    types = rng.integers(1, 6, size=n).astype(np.int32)
    res = interaction_enrichment(a, types, n_perms=0)
    k = max(TYPE_NAMES)
    want = np.zeros((k, k))
    dense = np.triu(a.toarray(), 1)
    for i, j in zip(*np.nonzero(dense)):
        ti, tj = sorted((types[i], types[j]))
        want[ti - 1, tj - 1] += 1
    want = want + np.triu(want, 1).T
    np.testing.assert_array_equal(res["observed"], want)
    # expected sums to the total edge count
    assert np.triu(res["expected"]).sum() == pytest.approx(dense.sum(), rel=1e-9)


def test_interaction_counts_many_types(rng):
    """n_types=200: the pair-code arithmetic must not overflow narrow int
    dtypes ((k+1)*(k+3) ≈ 40k exceeds int16 from k≈180)."""
    n, k = 80, 200
    a = adjacency(_random_edge_index(rng, n, 260), n)
    types = rng.integers(1, k + 1, size=n).astype(np.int32)
    res = interaction_enrichment(a, types, n_types=k, n_perms=0)
    want = np.zeros((k, k))
    dense = np.triu(a.toarray(), 1)
    for i, j in zip(*np.nonzero(dense)):
        ti, tj = sorted((types[i], types[j]))
        want[ti - 1, tj - 1] += 1
    want = want + np.triu(want, 1).T
    np.testing.assert_array_equal(res["observed"], want)


def test_interaction_zscores_detect_assortativity(rng):
    """Two spatial clusters of distinct types: on-diagonal enrichment must
    be strongly positive, cross-type strongly negative."""
    n_half = 40
    pts = np.concatenate(
        [rng.normal(0, 5, size=(n_half, 2)), rng.normal(100, 5, size=(n_half, 2))]
    )
    types = np.r_[np.ones(n_half), np.full(n_half, 2)].astype(np.int32)
    from path_gene_multimodal_tpu.ops.neighbors import radius_graph

    ei, _ = radius_graph(pts.astype(np.float32), radius=15.0)
    a = adjacency(ei, len(pts))
    res = interaction_enrichment(a, types, n_perms=100, seed=1)
    z = res["zscores"]
    assert z[0, 0] > 3 and z[1, 1] > 3
    assert z[0, 1] < -3


def test_eigenvector_centrality_bipartite_star():
    """A hub-and-spokes star is bipartite (±λ eigenvalue pairs): plain-A
    power iteration limit-cycles; the +I shift must converge to the known
    principal eigenvector ∝ (√k, 1, …, 1)."""
    from scipy import sparse

    k = 12
    src = np.zeros(k, np.int64)
    dst = np.arange(1, k + 1, dtype=np.int64)
    a = adjacency(np.stack([np.r_[src, dst], np.r_[dst, src]]), k + 1)
    c = eigenvector_centrality(a)
    golden = np.r_[np.sqrt(k), np.ones(k)]
    golden /= np.linalg.norm(golden)
    np.testing.assert_allclose(np.abs(c), golden, atol=1e-8)


def test_interaction_expected_consistent_with_null_when_types_invalid(rng):
    """Edges touching out-of-range types are dropped from `observed`; the
    analytic `expected` must reflect the same filtering (q over ALL nodes),
    i.e. match the permutation-null mean."""
    n = 200
    a = adjacency(_random_edge_index(rng, n, 800), n)
    types = rng.integers(0, 6, size=n).astype(np.int32)  # ~1/6 type-0
    res = interaction_enrichment(a, types, n_perms=400, seed=3)
    src, dst = np.nonzero(np.triu(a.toarray(), 1))
    # permutation-null mean of total valid-valid edge count
    null_tot = []
    prng = np.random.default_rng(99)
    for _ in range(400):
        t = prng.permutation(types)
        null_tot.append(((t[src] >= 1) & (t[dst] >= 1)).sum())
    assert np.triu(res["expected"]).sum() == pytest.approx(
        np.mean(null_tot), rel=0.05
    )


def test_mixing_score_json_safe(rng):
    """immune-tumor edges with zero immune-immune edges: mixing_score is
    None (JSON null), never inf — the stats artifact must stay strict-JSON
    parseable."""
    from dataclasses import dataclass

    @dataclass
    class G:
        pos_um: np.ndarray
        types: np.ndarray

    # path graph T-I-T: two immune-tumor edges, no immune-immune edge
    ei = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
    a = adjacency(ei, 3)
    g = G(np.array([[0.0, 0], [1, 0], [2, 0]]), np.array([1, 2, 1], np.int32))
    m = tumor_immune_metrics(g, a)
    assert m["mixing_score"] is None
    assert json.loads(json.dumps(m, allow_nan=False))["mixing_score"] is None


def test_tumor_immune_metrics_brute_force(rng):
    from dataclasses import dataclass

    n = 80
    pos = rng.uniform(0, 300, size=(n, 2))
    types = rng.integers(1, 4, size=n).astype(np.int32)

    @dataclass
    class G:
        pos_um: np.ndarray
        types: np.ndarray

    from path_gene_multimodal_tpu.ops.neighbors import radius_graph

    ei, _ = radius_graph(pos.astype(np.float32), radius=40.0)
    a = adjacency(ei, n)
    m = tumor_immune_metrics(G(pos, types), a)
    dense = a.toarray()
    tumor, immune = np.nonzero(types == 1)[0], np.nonzero(types == 2)[0]
    want_inf = np.mean([dense[t][immune].sum() > 0 for t in tumor])
    assert m["immune_infiltration_frac"] == pytest.approx(want_inf)
    d = np.sqrt(((pos[immune][:, None] - pos[tumor][None]) ** 2).sum(-1)).min(1)
    assert m["immune_to_tumor_dist_um_mean"] == pytest.approx(d.mean(), rel=1e-6)
    it = ii = 0
    for i, j in zip(*np.nonzero(np.triu(dense, 1))):
        s = {types[i], types[j]}
        if s == {1, 2}:
            it += 1
        elif s == {2}:
            ii += 1
    assert m["immune_tumor_edges"] == it and m["immune_immune_edges"] == ii


def test_degenerate_graphs():
    from scipy import sparse

    empty = sparse.csr_matrix((0, 0))
    assert eigenvector_centrality(empty).shape == (0,)
    lone = adjacency(np.zeros((2, 0), np.int64), 3)  # 3 isolated nodes
    assert degrees(lone).tolist() == [0, 0, 0]
    assert clustering_coefficients(lone).tolist() == [0, 0, 0]
    comp = neighborhood_composition(lone, np.array([1, 2, 3], np.int32))
    assert not np.isnan(comp).any() and comp.sum() == 0
    res = interaction_enrichment(lone, np.array([1, 2, 3], np.int32), n_perms=5)
    assert res["observed"].sum() == 0 and not np.isnan(res["expected"]).any()


def test_analyze_graph_end_to_end(tmp_path, rng):
    n = 120
    rows = [
        {
            "nuc_id": f"n{i}",
            "type": int(rng.integers(1, 6)),
            "wsi_centroid_x": float(rng.uniform(0, 1500)),
            "wsi_centroid_y": float(rng.uniform(0, 1500)),
            "area": float(rng.uniform(40, 200)),
            "perimeter": float(rng.uniform(20, 70)),
            "eccentricity": float(rng.uniform(0, 0.9)),
            "solidity": float(rng.uniform(0.7, 1.0)),
            "major_axis_length": float(rng.uniform(8, 20)),
            "minor_axis_length": float(rng.uniform(4, 10)),
            "orientation": float(rng.uniform(-1.5, 1.5)),
        }
        for i in range(n)
    ]
    g = build_cell_graph(
        pd.DataFrame(rows), GraphConfig(), out_dir=tmp_path, stem="s"
    )
    summary = analyze_graph(g, out_dir=tmp_path, stem="s", n_perms=20)
    assert summary["n_nodes"] == n
    assert summary["n_edges"] >= 0
    assert set(summary["type_counts"]) == set(TYPE_NAMES.values())
    # artifacts round-trip
    loaded = json.loads((tmp_path / "s_graph_stats.json").read_text())
    assert loaded["n_nodes"] == n and "interaction_zscores" in loaded
    node = np.load(tmp_path / "s_graph_node_stats.npz", allow_pickle=True)
    assert node["degree"].shape == (n,)
    assert node["neighborhood_composition"].shape == (n, max(TYPE_NAMES))
    # JSON is pure stdlib types (the done-flag json_safe convention)
    json.dumps(summary.get("tumor_immune"))


def test_graph_cli(tmp_path, rng):
    """pgm-tpu-graph: nuclei parquet in → graph + stage-6 artifacts out."""
    from path_gene_multimodal_tpu.cli.graph_build import main

    n = 80
    df = pd.DataFrame(
        {
            "nuc_id": [f"n{i}" for i in range(n)],
            "type": rng.integers(1, 6, n),
            "wsi_centroid_x": rng.uniform(0, 1000, n),
            "wsi_centroid_y": rng.uniform(0, 1000, n),
            "area": rng.uniform(40, 200, n),
            "perimeter": rng.uniform(20, 70, n),
            "eccentricity": rng.uniform(0, 0.9, n),
            "solidity": rng.uniform(0.7, 1.0, n),
            "major_axis_length": rng.uniform(8, 20, n),
            "minor_axis_length": rng.uniform(4, 10, n),
            "orientation": rng.uniform(-1.5, 1.5, n),
        }
    )
    src = tmp_path / "case1_hovernet_nuclei_wsi.parquet"
    df.to_parquet(src)
    rc = main([
        "--nuclei", str(src), "--output", str(tmp_path / "g"),
        "--radius-um", "60", "--n-perms", "10",
    ])
    assert rc == 0
    assert (tmp_path / "g" / "case1_cell_graph.npz").exists()
    stats = json.loads((tmp_path / "g" / "case1_graph_stats.json").read_text())
    assert stats["n_nodes"] == n
    # type filter restricts the node set
    rc = main([
        "--nuclei", str(src), "--output", str(tmp_path / "g2"),
        "--type-filter", "1", "2", "--n-perms", "0",
    ])
    assert rc == 0
    stats2 = json.loads((tmp_path / "g2" / "case1_graph_stats.json").read_text())
    assert stats2["n_nodes"] == int(df["type"].isin([1, 2]).sum())
    # missing input fails cleanly
    assert main(["--nuclei", str(tmp_path / "nope.csv"),
                 "--output", str(tmp_path)]) == 2
    # a type filter matching no rows exits 2 cleanly, no traceback
    assert main([
        "--nuclei", str(src), "--output", str(tmp_path / "g3"),
        "--type-filter", "99",
    ]) == 2
