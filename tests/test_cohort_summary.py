"""Cohort summary CLI: joins per-slide artifacts (the frozen OUTROOT
contracts) into one table; partial cohorts keep empty columns."""

import json

import numpy as np
import pandas as pd

from path_gene_multimodal_tpu.cli.cohort_summary import discover_slides, main


def _make_slide(outroot, stem, done=True, molecular=True, nuclei=True,
                graph=True):
    d = outroot / stem
    d.mkdir(parents=True)
    (d / f"{stem}.h5").write_bytes(b"")  # discovery marker
    if done:
        (d / f"{stem}._DONE.json").write_text(json.dumps({
            "status": "done", "num_tiles": 10, "num_features": 10,
            "model_type": "CLIP",
        }))
    ann = pd.DataFrame({
        "tile_index": range(10), "x": range(10), "y": range(10),
        "predicted_class": ["Tumor"] * 7 + ["Stroma"] * 3,
        "in_tme_roi": [True] * 4 + [False] * 6,
    })
    ann.to_csv(d / f"{stem}_annotations_with_coords.csv", index=False)
    if molecular:
        pd.DataFrame({"msi_prob": [0.2, 0.4], "tp53_prob": [1.0, 0.0]}).to_csv(
            d / f"{stem}_molecular_features.csv", index=False
        )
    if nuclei:
        pd.DataFrame({
            "nuc_id": ["a", "b", "c"],
            "type": [1, 1, 2],
            "type_name": ["neoplastic", "neoplastic", "inflammatory"],
        }).to_csv(d / f"{stem}_hovernet_nuclei_wsi.csv", index=False)
    if graph:
        (d / f"{stem}_graph_stats.json").write_text(json.dumps({
            "n_edges": 5, "mean_degree": 1.2, "mean_clustering": 0.3,
            "tumor_immune": {"immune_infiltration_frac": 0.5,
                             "mixing_score": None},
        }))
    return d


def test_cohort_summary(tmp_path):
    _make_slide(tmp_path, "s1")
    _make_slide(tmp_path, "s2", done=False, molecular=False, nuclei=False,
                graph=False)
    (tmp_path / "s2" / "s2_ERROR.txt").write_text("boom")
    (tmp_path / "not_a_slide").mkdir()  # no markers → ignored

    assert [s for _, s in discover_slides(tmp_path)] == ["s1", "s2"]
    assert main(["--outroot", str(tmp_path)]) == 0
    df = pd.read_csv(tmp_path / "cohort_summary.csv")
    assert list(df["stem"]) == ["s1", "s2"]
    r1 = df.iloc[0]
    assert r1["status"] == "done" and r1["num_tiles"] == 10
    assert r1["tme_roi_frac"] == 0.4
    assert r1["tile_frac[Tumor]"] == 0.7
    assert r1["mean_msi_prob"] == 0.3 and r1["mean_tp53_prob"] == 0.5
    assert r1["n_nuclei"] == 3 and r1["n_nuclei[neoplastic]"] == 2
    assert r1["graph_edges"] == 5
    assert r1["immune_infiltration_frac"] == 0.5
    assert np.isnan(r1["mixing_score"])  # JSON null → NaN in the table
    r2 = df.iloc[1]
    assert r2["status"] == "error"
    assert np.isnan(r2["mean_msi_prob"]) and np.isnan(r2["n_nuclei"])


def test_cohort_summary_corrupt_artifacts_fail_soft(tmp_path):
    """A half-written table (another worker mid-write) costs its OWN
    columns only — the cohort run completes and other artifacts of the
    same slide still populate."""
    _make_slide(tmp_path, "s1")
    d = _make_slide(tmp_path, "s2")
    # truncated parquet takes priority over the intact CSV → read fails
    (d / "s2_hovernet_nuclei_wsi.parquet").write_bytes(b"PAR1\x00garbage")
    # binary garbage in a CSV pandas cannot tokenize
    (d / "s2_molecular_features.csv").write_bytes(b"\x00\xff" * 64 + b'"')

    assert main(["--outroot", str(tmp_path)]) == 0
    df = pd.read_csv(tmp_path / "cohort_summary.csv").set_index("stem")
    r2 = df.loc["s2"]
    assert r2["status"] == "done"  # done flag still read
    assert r2["tme_roi_frac"] == 0.4  # intact annotations still read
    assert np.isnan(r2["n_nuclei"]) and np.isnan(r2["mean_msi_prob"])
    assert "s2_hovernet_nuclei_wsi.parquet" in r2["read_errors"]
    assert "s2_molecular_features.csv" in r2["read_errors"]
    r1 = df.loc["s1"]
    assert r1["n_nuclei"] == 3 and r1["mean_msi_prob"] == 0.3
    assert not isinstance(r1.get("read_errors"), str)


def test_cohort_summary_empty_and_missing(tmp_path):
    assert main(["--outroot", str(tmp_path / "nope")]) == 2
    empty = tmp_path / "empty"
    empty.mkdir()
    assert main(["--outroot", str(empty)]) == 2
