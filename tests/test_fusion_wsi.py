"""Multimodal fusion head + whole-WSI sliding-window nuclei mode."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.io.slide import synthetic_wsi
from path_gene_multimodal_tpu.models.fusion import (
    AttentionPool,
    FusionHead,
    GeneExpressionTable,
    make_fusion_trainer,
    slide_embedding,
)
from path_gene_multimodal_tpu.pipeline.nuclei_wsi import iter_windows, run_hovernext_wsi


def test_slide_embedding_methods(rng):
    f = rng.normal(size=(50, 16)).astype(np.float32)
    np.testing.assert_allclose(slide_embedding(f, "mean"), f.mean(0), rtol=1e-6)
    np.testing.assert_allclose(slide_embedding(f, "max"), f.max(0), rtol=1e-6)
    assert slide_embedding(f, "mean_max").shape == (32,)
    with pytest.raises(ValueError, match="no tile features"):
        slide_embedding(np.zeros((0, 16)))


def test_attention_pool_weighted(rng):
    pool = AttentionPool(hidden=8)
    tiles = jnp.asarray(rng.normal(size=(10, 16)).astype(np.float32))
    params = pool.init(jax.random.PRNGKey(0), tiles)
    out = pool.apply(params, tiles)
    assert out.shape == (16,)
    # mask removes influence of masked tiles
    mask = jnp.asarray([True] * 5 + [False] * 5)
    out_m = pool.apply(params, tiles, mask)
    out_m2 = pool.apply(params, tiles.at[5:].set(999.0), mask)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_m2), atol=1e-4)


def test_gene_expression_table(tmp_path):
    df = pd.DataFrame(
        {"s1": [10.0, 0.0, 5.0], "s2": [20.0, 1.0, 5.0], "s3": [0.0, 2.0, 5.0]},
        index=["TP53", "BRCA1", "EGFR"],
    )
    p = tmp_path / "expr.tsv"
    df.to_csv(p, sep="\t")
    tbl = GeneExpressionTable.from_csv(p)
    assert tbl.genes == ["TP53", "BRCA1", "EGFR"]
    assert tbl.samples == ["s1", "s2", "s3"]
    assert tbl.values.shape == (3, 3)
    # z-scored per gene
    np.testing.assert_allclose(tbl.values.mean(axis=0), 0, atol=1e-6)
    v = tbl.vector_for("s2")
    assert v.shape == (3,)
    with pytest.raises(KeyError):
        tbl.vector_for("nope")


def test_fusion_trainer_learns(rng):
    hist_dim, gene_dim, n = 32, 20, 64
    hist = rng.normal(size=(n, hist_dim)).astype(np.float32)
    genes = rng.normal(size=(n, gene_dim)).astype(np.float32)
    # label depends on both modalities → fusion must use both
    labels = ((hist[:, 0] + genes[:, 0]) > 0).astype(np.int32)
    model = FusionHead(num_outputs=2, proj_dim=16, hidden=16, dropout=0.0)
    state, step, predict = make_fusion_trainer(model, hist_dim, gene_dim, 1e-2)
    losses = []
    for _ in range(60):
        state, loss = step(state, jnp.asarray(hist), jnp.asarray(genes), jnp.asarray(labels))
        losses.append(float(loss))
    assert losses[-1] < 0.35 < losses[0]
    probs = np.asarray(predict(state, jnp.asarray(hist), jnp.asarray(genes)))
    acc = ((probs[:, 1] > 0.5).astype(int) == labels).mean()
    assert acc > 0.85


def test_fusion_trainer_checkpoint_resume(rng, tmp_path):
    """Training checkpoint/resume (A4 for the training story): persist the
    full train state (params + optimizer moments + rng) mid-run, restore it,
    and continue — the resumed run must match the uninterrupted one
    bit-exactly (CPU backend = exact arithmetic)."""
    from path_gene_multimodal_tpu.core.checkpoints import load_params, save_params

    hist_dim, gene_dim, n = 16, 8, 32
    hist = jnp.asarray(rng.normal(size=(n, hist_dim)).astype(np.float32))
    genes = jnp.asarray(rng.normal(size=(n, gene_dim)).astype(np.float32))
    labels = jnp.asarray((rng.normal(size=n) > 0).astype(np.int32))
    model = FusionHead(num_outputs=2, proj_dim=8, hidden=8, dropout=0.1)

    state, step, _ = make_fusion_trainer(model, hist_dim, gene_dim, 1e-2)
    mid = None
    for i in range(6):
        if i == 3:
            mid = save_params(state, tmp_path / "train_state")
        state, loss = step(state, hist, genes, labels)
    final_uninterrupted = state

    restored = load_params(mid, like=make_fusion_trainer(model, hist_dim, gene_dim, 1e-2)[0])
    for _ in range(3):  # steps 3-5 again, from the checkpoint
        restored, loss = step(restored, hist, genes, labels)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        final_uninterrupted["params"], restored["params"],
    )


# --- WSI sliding-window nuclei --------------------------------------------


def test_axis_candidates_matches_linear_scan(rng):
    """The bisect-based containing-window search must agree with the
    brute-force grid scan for every (bbox, grid) combination — including the
    relaxed boundary-window semantics."""
    from path_gene_multimodal_tpu.pipeline.nuclei_wsi import (
        axis_candidates,
        contains_1d,
        iter_windows,
    )

    window, stride = 256, 248
    for w0 in (256, 1000, 3000):
        grid = sorted({x for x, _ in iter_windows(w0, 256, window, stride)})
        for _ in range(300):
            lo = float(rng.uniform(-5, w0 + 5))
            hi = lo + float(rng.uniform(0, 80))
            golden = [w for w in grid if contains_1d(lo, hi, w, grid, window)]
            assert axis_candidates(lo, hi, grid, window) == golden, (w0, lo, hi)
    ws = iter_windows(1000, 600, 256, 248)
    xs = sorted({x for x, _ in ws})
    ys = sorted({y for _, y in ws})
    assert xs[0] == 0 and xs[-1] == 1000 - 256  # clamped final window
    assert ys[-1] == 600 - 256
    # full coverage
    covered_x = np.zeros(1000, bool)
    for x in xs:
        covered_x[x : x + 256] = True
    assert covered_x.all()


def test_iter_windows_small_slide():
    assert iter_windows(100, 100, 256, 248) == [(0, 0)]


class StripeFakeModel:
    """Deterministic: one nucleus per window at a window-local position that
    maps to a unique WSI location; windows overlapping the same nucleus
    region produce it identically so dedup must keep exactly one."""

    def __init__(self, input_size=256):
        from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig

        self.cfg = HoverNeXtConfig(input_size=input_size)
        self.max_instances = 16

    def segment(self, tiles_u8):
        tiles_u8 = np.asarray(tiles_u8)  # device arrays under the planar feed
        b, s, _, _ = tiles_u8.shape
        inst = np.zeros((b, s, s), np.int32)
        types = np.zeros((b, s, s), np.int32)
        # nucleus = red-channel blob marker painted on the slide; find it
        for bi in range(b):
            mask = tiles_u8[bi, :, :, 0] > 200
            if mask.sum() > 20:
                inst[bi][mask] = 1
                types[bi][mask] = 1
        return inst, types


def test_run_hovernext_wsi_dedup(tmp_path):
    cfg = default_config()
    # slide with two bright-red square "nuclei" at known level-0 positions
    img = np.full((600, 1000, 3), 30, np.uint8)
    img[100:110, 120:130] = [255, 0, 0]
    img[400:410, 700:710] = [255, 0, 0]
    from path_gene_multimodal_tpu.io.slide import ArraySlide

    slide = ArraySlide(img)
    model = StripeFakeModel()
    map_path, nuclei = run_hovernext_wsi(
        slide, tmp_path, "w", model, cfg, batch_size=4
    )
    # exactly 2 unique nuclei despite overlapping windows
    assert len(nuclei) == 2, nuclei[["tile_x", "tile_y", "centroid_x", "centroid_y"]]
    cents = sorted(
        (round(r["wsi_centroid_x"]), round(r["wsi_centroid_y"]))
        for _, r in nuclei.iterrows()
    )
    assert cents == [(124, 104), (704, 404)]  # centroid of 10px squares (.5 mean)
    assert sorted(nuclei["inst_id"]) == [1, 2]  # globally unique ids
    # instance map artifact
    with np.load(map_path) as z:
        m = z["inst_map"]
        assert m.shape == (600, 1000)
        assert set(np.unique(m)) == {0, 1, 2}
        assert m[104, 124] > 0
    assert (tmp_path / "w_hovernet_nuclei_wsi.parquet").exists()


def test_hovernext_infer_cli(tmp_path, monkeypatch):
    from path_gene_multimodal_tpu.cli import hovernext_infer as hn
    from path_gene_multimodal_tpu.pipeline import nuclei as nuclei_mod
    from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig
    from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig

    slide = synthetic_wsi(600, 500, seed=9, n_blobs=2, nuclei_per_blob=10)
    p = tmp_path / "cli.npz"
    slide.save(p)
    # open_slide rejects .npz? no — it handles it. Small model via monkeypatch.
    orig_build = nuclei_mod.NucleiModel.build.__func__

    def small_build(cls, cfg=None, **kw):
        mcfg = HoverNeXtConfig(
            encoder=ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64)),
            decoder_dims=(32, 16, 8, 8), input_size=256,
        )
        kw.pop("params", None)
        kw.pop("tta", None)
        import jax.numpy as jnp

        return orig_build(nuclei_mod.NucleiModel, mcfg, dtype=jnp.float32,
                          tta=1, mesh=kw.pop("mesh", None))

    monkeypatch.setattr(nuclei_mod.NucleiModel, "build", classmethod(small_build))
    rc = hn.main(["--input", str(p), "--output", str(tmp_path / "out"),
                  "--mode", "wsi", "--batch-size", "4"])
    assert rc == 0
    assert (tmp_path / "out" / "cli_hovernet_nuclei_wsi.csv").exists()
    assert (tmp_path / "out" / "cli_pinst_pp.npz").exists()
    # --dp: same run sharded over the 8-device test mesh via the CLI flag
    rc = hn.main(["--input", str(p), "--output", str(tmp_path / "out_dp"),
                  "--mode", "wsi", "--batch-size", "8", "--dp"])
    assert rc == 0
    assert (tmp_path / "out_dp" / "cli_hovernet_nuclei_wsi.csv").exists()
    # --dp with a batch that does not divide the mesh → exit 2
    assert hn.main(["--input", str(p), "--output", str(tmp_path / "out_bad"),
                    "--mode", "wsi", "--batch-size", "3", "--dp"]) == 2
    # missing input → exit 2
    assert hn.main(["--input", str(tmp_path / "nope.svs"), "--output", str(tmp_path)]) == 2
    # tiles mode without csv → exit 2
    assert hn.main(["--input", str(p), "--output", str(tmp_path), "--mode", "tiles"]) == 2

    # reference prepare_input surface: a .txt list of inputs, one model
    # build, per-stem output subdirectories; .npy raw-array input type
    import numpy as np

    np.save(tmp_path / "raw.npy", slide._levels[0])
    lst = tmp_path / "inputs.txt"
    lst.write_text(f"{p}\n{tmp_path / 'raw.npy'}\n")
    rc = hn.main(["--input", str(lst), "--output", str(tmp_path / "multi"),
                  "--mode", "wsi", "--batch-size", "4"])
    assert rc == 0
    assert (tmp_path / "multi" / "cli" / "cli_hovernet_nuclei_wsi.csv").exists()
    assert (tmp_path / "multi" / "raw" / "raw_hovernet_nuclei_wsi.csv").exists()
    # unmatched glob / empty txt / tiles mode with several inputs → exit 2
    assert hn.main(["--input", str(tmp_path / "*.nothere"),
                    "--output", str(tmp_path)]) == 2
    empty = tmp_path / "empty.txt"
    empty.write_text("\n")
    assert hn.main(["--input", str(empty), "--output", str(tmp_path)]) == 2
    assert hn.main(["--input", str(lst), "--output", str(tmp_path),
                    "--mode", "tiles", "--annotations-csv", "x.csv"]) == 2

    # duplicate stems across directories: per-stem dirs uniquified with a
    # numeric suffix, never silently overwritten
    sub = tmp_path / "sub"
    sub.mkdir()
    slide.save(sub / "cli.npz")
    dups = tmp_path / "dups.txt"
    dups.write_text(f"{p}\n{sub / 'cli.npz'}\n")
    rc = hn.main(["--input", str(dups), "--output", str(tmp_path / "dup"),
                  "--mode", "wsi", "--batch-size", "4"])
    assert rc == 0
    assert (tmp_path / "dup" / "cli" / "cli_hovernet_nuclei_wsi.csv").exists()
    assert (tmp_path / "dup" / "cli_2" / "cli_2_hovernet_nuclei_wsi.csv").exists()

    # one corrupt slide fails soft in multi-input mode: the rest complete,
    # exit code 1 (batch_run.py convention); single-input re-raises
    bad = tmp_path / "corrupt.npz"
    bad.write_bytes(b"not a zip archive")
    withbad = tmp_path / "withbad.txt"
    withbad.write_text(f"{p}\n{bad}\n{sub / 'cli.npz'}\n")
    rc = hn.main(["--input", str(withbad), "--output", str(tmp_path / "soft"),
                  "--mode", "wsi", "--batch-size", "4"])
    assert rc == 1
    assert (tmp_path / "soft" / "cli" / "cli_hovernet_nuclei_wsi.csv").exists()
    assert (tmp_path / "soft" / "cli_2" / "cli_2_hovernet_nuclei_wsi.csv").exists()
    import pytest

    with pytest.raises(Exception):
        hn.main(["--input", str(bad), "--output", str(tmp_path / "single"),
                 "--mode", "wsi", "--batch-size", "4"])


def test_resolve_inputs_glob(tmp_path):
    from path_gene_multimodal_tpu.cli.hovernext_infer import resolve_inputs

    (tmp_path / "a.svs").write_bytes(b"x")
    (tmp_path / "b.svs").write_bytes(b"x")
    got = resolve_inputs(str(tmp_path / "*.svs"))
    assert [g.name for g in got] == ["a.svs", "b.svs"]
    # a plain existing path matches itself
    assert resolve_inputs(str(tmp_path / "a.svs")) == [tmp_path / "a.svs"]
    import pytest

    with pytest.raises(FileNotFoundError):
        resolve_inputs(str(tmp_path / "nope.txt"))
    with pytest.raises(ValueError):
        resolve_inputs(str(tmp_path / "*.tif"))


def test_run_hovernext_wsi_seam_straddler(tmp_path):
    """A nucleus wider than the 8-px window overlap straddling a seam:
    each window sees a clipped half — the stitcher must emit exactly ONE
    instance (clipped-view fallback + proximity dedup)."""
    cfg = default_config()
    img = np.full((400, 800, 3), 30, np.uint8)
    # stride 248: the first vertical seam band is x in [248, 256);
    # paint a 30-px-wide nucleus centered on x=252 (crosses the seam)
    img[200:210, 237:267] = [255, 0, 0]
    from path_gene_multimodal_tpu.io.slide import ArraySlide

    slide = ArraySlide(img)
    map_path, nuclei = run_hovernext_wsi(
        slide, tmp_path, "seam", StripeFakeModel(), default_config(), batch_size=4
    )
    assert len(nuclei) == 1, nuclei[["tile_x", "tile_y", "wsi_centroid_x"]]
    r = nuclei.iloc[0]
    assert abs(r["wsi_centroid_x"] - 251.5) < 16  # near the true centroid
    assert abs(r["wsi_centroid_y"] - 204.5) < 2


def test_run_hovernext_wsi_edge_and_seam_straddler(tmp_path):
    """Advisor regression: a nucleus touching the slide's TOP edge while
    straddling a vertical seam (x across the [988, 1000) overlap strip of
    windows 744 and 992). Both views used to take the at_slide_edge branch,
    compute first_containing_window=None from their own clipped bbox, and
    emit the row marked clean — producing a duplicate the clean-clean dedup
    skip never collapsed. Must now emit exactly ONE instance."""
    cfg = default_config()
    img = np.full((400, 1300, 3), 30, np.uint8)
    img[0:20, 988:1012] = [255, 0, 0]  # touches y=0, straddles x-seam at 992
    from path_gene_multimodal_tpu.io.slide import ArraySlide

    map_path, nuclei = run_hovernext_wsi(
        ArraySlide(img), tmp_path, "edgeseam", StripeFakeModel(), cfg, batch_size=4
    )
    assert len(nuclei) == 1, nuclei[["tile_x", "tile_y", "wsi_centroid_x", "wsi_centroid_y"]]
    r = nuclei.iloc[0]
    assert abs(r["wsi_centroid_x"] - 999.5) < 16
    assert abs(r["wsi_centroid_y"] - 9.5) < 2


def test_sparse_instance_map_roundtrip(tmp_path, monkeypatch):
    from path_gene_multimodal_tpu.pipeline import nuclei_wsi as nw

    monkeypatch.setattr(nw, "DENSE_MAP_MAX_PIXELS", 10)  # force sparse path
    img = np.full((300, 300, 3), 30, np.uint8)
    img[100:110, 100:110] = [255, 0, 0]
    from path_gene_multimodal_tpu.io.slide import ArraySlide

    map_path, nuclei = nw.run_hovernext_wsi(
        ArraySlide(img), tmp_path, "sp", StripeFakeModel(), default_config(), batch_size=4
    )
    assert len(nuclei) == 1
    with np.load(map_path) as z:
        assert "inst_map" not in z  # sparse format
        assert len(z["ids"]) == 100
    dense = nw.load_instance_map(map_path)
    assert dense.shape == (300, 300)
    assert (dense == 1).sum() == 100
    assert dense[104, 104] == 1


def test_run_hovernext_wsi_sharded_matches_single(tmp_path):
    """VERDICT item 7: the WSI sliding-window stitcher must produce the
    IDENTICAL nuclei table when window batches are sharded over the
    8-device mesh (data parallelism must not change exactly-once dedup)."""
    import jax.numpy as jnp

    from path_gene_multimodal_tpu.io.slide import ArraySlide
    from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig
    from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig
    from path_gene_multimodal_tpu.parallel.mesh import make_mesh
    from path_gene_multimodal_tpu.pipeline.nuclei import NucleiModel

    cfg = default_config()
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (160, 224, 3)).astype(np.uint8)
    slide = ArraySlide(img)
    mcfg = HoverNeXtConfig(
        encoder=ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64)),
        decoder_dims=(32, 16, 8, 8), input_size=64,
    )
    single = NucleiModel.build(mcfg, dtype=jnp.float32, tta=1, max_instances=64)
    mesh = make_mesh(8)
    sharded = NucleiModel.build(
        mcfg, params=single.params, dtype=jnp.float32, tta=1,
        max_instances=64, mesh=mesh,
    )
    _, n1 = run_hovernext_wsi(slide, tmp_path / "a", "s", single, cfg,
                              batch_size=8, write_instance_map=False)
    _, n2 = run_hovernext_wsi(slide, tmp_path / "b", "s", sharded, cfg,
                              batch_size=8, write_instance_map=False)
    assert len(n1) == len(n2)
    if len(n1):
        drop = ["nuc_id", "tile_path"]  # uuid / path differ by out_dir
        pd.testing.assert_frame_equal(
            n1.drop(columns=drop).reset_index(drop=True),
            n2.drop(columns=drop).reset_index(drop=True),
        )


def test_wsi_adjacent_distinct_nuclei_not_merged(tmp_path):
    """Two distinct nuclei 14 px apart, both clean (fully inside one
    window): the dedup pass must NOT merge them."""
    cfg = default_config()
    img = np.full((400, 400, 3), 30, np.uint8)
    img[100:110, 100:110] = [255, 0, 0]
    img[100:110, 114:124] = [255, 0, 0]  # 14 px from the first, same window

    class TwoBlobModel(StripeFakeModel):
        def segment(self, tiles_u8):
            b, s, _, _ = tiles_u8.shape
            inst = np.zeros((b, s, s), np.int32)
            types = np.zeros((b, s, s), np.int32)
            for bi in range(b):
                mask = tiles_u8[bi, :, :, 0] > 200
                if mask.sum() < 20:
                    continue
                # split the red mask into two ids by x-gap (simple CC)
                from scipy.ndimage import label as ndi_label

                lbl, n = ndi_label(mask)
                inst[bi] = lbl
                types[bi][mask] = 1
            return inst, types

    from path_gene_multimodal_tpu.pipeline.nuclei_wsi import run_hovernext_wsi as run

    _, nuclei = run(
        __import__("path_gene_multimodal_tpu.io.slide", fromlist=["ArraySlide"]).ArraySlide(img),
        tmp_path, "adj", TwoBlobModel(), cfg, batch_size=4,
    )
    assert len(nuclei) == 2, nuclei[["wsi_centroid_x", "wsi_centroid_y"]]


def test_run_hovernext_wsi_planar_feed(tmp_path):
    """The WSI sliding-window stitcher over a real JPEG slide with the
    planar (4:2:0 device-feed) path: same nuclei as the RGB feed. JPEG is
    lossy, so assertions use the known marker geometry with 2 px slack."""
    from dataclasses import replace

    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff

    cfg = default_config()
    img = np.full((600, 1000, 3), 30, np.uint8)
    img[100:110, 120:130] = [255, 0, 0]
    img[400:410, 700:710] = [255, 0, 0]
    p = write_tiled_tiff(tmp_path / "w.svs", [img], tile_size=256,
                         compression=7, jpeg_quality=95)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None or not slide.supports_planar(0):
        pytest.skip("native planar decoder unavailable")
    for sub, planar in [("a", True), ("b", False)]:
        c = replace(cfg, hovernext=replace(cfg.hovernext, planar_feed=planar))
        out = tmp_path / sub
        out.mkdir()
        _, nuclei = run_hovernext_wsi(
            slide, out, "w", StripeFakeModel(), c, batch_size=4
        )
        assert len(nuclei) == 2, (planar, nuclei)
        cents = sorted(
            (r["wsi_centroid_x"], r["wsi_centroid_y"])
            for _, r in nuclei.iterrows()
        )
        for got, want in zip(cents, [(124, 104), (704, 404)]):
            assert abs(got[0] - want[0]) < 2 and abs(got[1] - want[1]) < 2, (
                planar, cents,
            )


def test_attention_pool_all_masked_is_finite(rng):
    """A fully padded bag must pool to zeros, not NaN (softmax of all -inf)."""
    from path_gene_multimodal_tpu.models.fusion import AttentionPool

    tiles = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    pool = AttentionPool(hidden=4)
    params = pool.init(jax.random.PRNGKey(0), tiles)
    out = np.asarray(pool.apply(params, tiles, mask=jnp.zeros(6, bool)))
    assert np.isfinite(out).all() and (out == 0).all()
