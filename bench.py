"""Benchmark harness — north-star metric: tiles/sec/chip through the full
tile → embed → HoverNeXt → postproc → graph path (BASELINE.md; the
reference publishes no numbers, so vs_baseline is measured against the
driver target of 100k tiles end-to-end in <5 min on v5e-8 = 41.67
tiles/s/chip).

The headline ``value`` is the MEASURED streamed rate over a ≥10k-tile
synthetic slide (JPEG bytes → decode → embed + seg forward + watershed +
instance features per batch → whole-slide kNN/radius graph), not a
harmonic composition — the composition is kept in ``detail`` for
stage-level comparisons across rounds. The watershed consumes the maps
the network actually produced: the model's three 1×1 heads are ridge-fit
on the synthetic slide (``utils.headfit`` — identical architecture and
compute cost, non-empty masks; the reference always runs from the
published checkpoint, ``hovernet_inference.py:82-131``, which this
zero-egress environment cannot fetch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Runs on whatever backend JAX selects (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

setup_jax()

import numpy as np  # noqa: E402

TARGET_TILES_PER_SEC_PER_CHIP = 100_000 / 300.0 / 8.0  # driver north-star


def _median_rate(fn, n_items: int, warmup: int = 1, iters: int = 4) -> float:
    """``fn`` returns device output (or None for host-side stages). Device
    completion is forced via a scalar readback: on the axon tunnel
    ``block_until_ready`` can return before execution finishes (measured:
    a 351 ms program "completes" in 0.2 ms) — a 4-byte D2H cannot lie."""

    def call():
        out = fn()
        if out is not None:
            import jax
            import jax.numpy as jnp

            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    for _ in range(warmup):
        call()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    return n_items / float(np.median(times))


def _preflight_backend(timeout_s: float = 180.0) -> None:
    """Fail FAST when the accelerator backend is unreachable: a dead axon
    tunnel blocks backend init for ~18 min before raising UNAVAILABLE —
    probe in a subprocess with a bounded wait instead (a live tunnel
    initializes in seconds; compiles are slow, init is not)."""
    import subprocess

    # the probe must resolve platforms exactly like this process (setup_jax
    # honors JAX_PLATFORMS over the sitecustomize re-pin) — a bare
    # `import jax` probe would camp on the axon tunnel even when the parent
    # was told to use CPU
    snippet = (
        f"import sys; sys.path.insert(0, {str(Path(__file__).parent)!r}); "
        "from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax; "
        "setup_jax(); import jax; jax.devices()"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", snippet],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"backend init did not complete within {timeout_s:.0f}s — "
            "accelerator tunnel unreachable; re-run when it is back"
        ) from None
    if proc.returncode != 0:
        raise RuntimeError(
            "backend init failed:\n" + (proc.stderr or proc.stdout)[-2000:]
        )


def _grid_for(slide_px: int, tile: int = 224) -> np.ndarray:
    side = np.arange(0, slide_px - tile, tile)
    return (
        np.stack(np.meshgrid(side, side), axis=-1).reshape(-1, 2).astype(np.int64)
    )


def _mosaic(level: np.ndarray, reps: int) -> np.ndarray:
    """reps×reps tiling of a level with flipped copies — scales the slide
    to production tile counts without a multi-GB float re-synthesis (every
    JPEG tile is still distinct bytes at a distinct offset)."""
    flips = (
        lambda a: a,
        lambda a: a[:, ::-1],
        lambda a: a[::-1],
        lambda a: a[::-1, ::-1],
    )
    rows = [
        np.concatenate(
            [flips[(r * reps + c) % 4](level) for c in range(reps)], axis=1
        )
        for r in range(reps)
    ]
    return np.ascontiguousarray(np.concatenate(rows, axis=0))


def measure_full_pipeline(seg, ensemble=None) -> dict:
    """The reference's per-WSI operating loop (``main.py:143-317``):
    8-step runner (tessellate → embed → class-embed → annotate → TME →
    polygons → GeoJSON → overlays) + nuclei + molecular + cell graph +
    stage-6 stats on one synthetic slide, WARM (second run; compiles and
    done-flags cleared between runs). Returns per-phase seconds."""
    import tempfile
    from dataclasses import replace as dc_replace

    from path_gene_multimodal_tpu.config import default_config
    from path_gene_multimodal_tpu.io.slide import open_slide, synthetic_wsi
    from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff
    from path_gene_multimodal_tpu.models.resnet import IDaRSEnsemble
    from path_gene_multimodal_tpu.pipeline.graph import build_cell_graph
    from path_gene_multimodal_tpu.pipeline.graph_stats import analyze_graph
    from path_gene_multimodal_tpu.pipeline.molecular import (
        extract_molecular_features,
    )
    from path_gene_multimodal_tpu.pipeline.nuclei import (
        run_hovernet_pipeline_on_wsi_tiles,
    )
    from path_gene_multimodal_tpu.pipeline.runner import (
        PipelineModels,
        run_one_wsi,
    )

    from path_gene_multimodal_tpu.io.slide import NUCLEUS_TYPE_COLORS

    out_root = Path(tempfile.mkdtemp(prefix="bench_runner_"))
    # same 3-type palette as the main bench slide: the TP head was fitted
    # per type, so the graph/stats stages run on a multi-type population
    synth = synthetic_wsi(4096, 3072, seed=42, n_blobs=5, nuclei_per_blob=450,
                          nucleus_colors=NUCLEUS_TYPE_COLORS)
    svs_path = out_root / "bench_case.svs"
    write_tiled_tiff(
        svs_path, [synth._levels[0], synth._levels[1], synth._levels[2]],
        tile_size=256, compression=7, description="Synthetic |MPP = 0.2500|",
    )

    cfg = default_config()
    cfg = cfg.replace(
        tme_classes=cfg.classes,  # random CLIP: any class seeds the ROI
        polygon=dc_replace(cfg.polygon, min_polygon_area_px=0, area_min_tiles=0),
    )
    models = PipelineModels.build(cfg)
    if ensemble is None:
        ensemble = IDaRSEnsemble(list(cfg.molecular.tasks))
    slide = open_slide(svs_path)

    def one_pass() -> dict:
        if (out_root / "bench_case").exists():
            shutil.rmtree(out_root / "bench_case")
        secs: dict[str, float] = {}
        t0 = time.perf_counter()
        result = run_one_wsi(svs_path, out_root, cfg, models=models)
        secs["runner_8step_sec"] = time.perf_counter() - t0
        assert result.status == "done", result.error
        out_dir, stem = result.out_dir, result.stem
        coords_csv = out_dir / f"{stem}_annotations_with_coords.csv"
        t0 = time.perf_counter()
        nuclei = run_hovernet_pipeline_on_wsi_tiles(
            slide, coords_csv, out_dir, stem, seg, cfg
        )
        secs["nuclei_stage_sec"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        extract_molecular_features(slide, coords_csv, out_dir, stem, ensemble, cfg)
        secs["molecular_stage_sec"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        graph = build_cell_graph(nuclei, cfg.graph, out_dir, stem)
        analyze_graph(graph, out_dir, stem, n_perms=50)
        secs["graph_stage_sec"] = time.perf_counter() - t0
        secs["nuclei_rows"] = len(nuclei)
        # ≥2 means the multi-type stats paths (interaction enrichment,
        # tumor–immune metrics) actually executed on this workload
        secs["nuclei_types"] = (
            int(nuclei["type"].nunique()) if len(nuclei) else 0
        )
        secs["graph_edges"] = int(graph.edge_index.shape[1])
        return secs

    one_pass()  # warm every program (persistent cache across rounds)
    secs = one_pass()
    secs["full_wsi_pipeline_sec"] = round(
        secs["runner_8step_sec"] + secs["nuclei_stage_sec"]
        + secs["molecular_stage_sec"] + secs["graph_stage_sec"], 3,
    )
    shutil.rmtree(out_root, ignore_errors=True)
    return {
        k: (round(v, 3) if isinstance(v, float) else v) for k, v in secs.items()
    }


def main() -> None:
    import tempfile

    _preflight_backend()

    import jax
    import jax.numpy as jnp

    from path_gene_multimodal_tpu.io.slide import synthetic_wsi
    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff
    from path_gene_multimodal_tpu.models.clip import CLIP_VIT_B16, ImageEncoder
    from path_gene_multimodal_tpu.models.hovernext import HOVERNEXT_TINY
    from path_gene_multimodal_tpu.ops.instances import instance_features_batch
    from path_gene_multimodal_tpu.ops.neighbors import combined_graphs
    from path_gene_multimodal_tpu.ops.pallas.flood import pallas_supported as _pallas_ok
    from path_gene_multimodal_tpu.pipeline.nuclei import NucleiModel
    from path_gene_multimodal_tpu.pipeline.tessellate import iter_tile_batches
    from path_gene_multimodal_tpu.utils.headfit import (
        fit_heads,
        sample_tissue_tiles,
    )

    from path_gene_multimodal_tpu.io.slide import NUCLEUS_TYPE_COLORS

    rng = np.random.default_rng(0)
    SLIDE_PX = 8192  # 36×36 = 1296-tile grid for the per-stage rates
    # nuclei_per_blob=600 ≈ 30-40 nuclei per tissue tile — the fitted
    # forward then hands the watershed a realistic instance workload.
    # 3-color nuclei → the per-type TP head fit gives downstream stats
    # (interaction enrichment, tumor–immune metrics) a REAL multi-type
    # population instead of a degenerate single class
    slide = synthetic_wsi(SLIDE_PX, SLIDE_PX, seed=0, n_blobs=20,
                          nuclei_per_blob=600,
                          nucleus_colors=NUCLEUS_TYPE_COLORS)

    # --- host tile decode from REAL JPEG TIFF bytes (native C++ decoder) ---
    # materialize the synthetic slide as a real JPEG-compressed tiled SVS so
    # the measured stage is file bytes → decoded RGB batches, the same path
    # tessellation/embedding run in production (ref hot loop: tiling.py:8)
    tiff_dir = tempfile.mkdtemp(prefix="bench_tiff_")
    svs_path = Path(tiff_dir) / "bench.svs"
    write_tiled_tiff(
        svs_path, [slide._levels[0], slide._levels[1]], tile_size=256,
        compression=7, description="Aperio bench |MPP = 0.2500|",
    )
    grid = _grid_for(SLIDE_PX)

    # ≥10k-tile slide for the streamed headline: 3×3 flip-mosaic of the
    # same tissue (24576² → 109² = 11,881 tiles) — fill/drain amortizes
    # and tile-LRU / host memory / graph accumulation run at real scale
    REPS = 3
    BIG_PX = SLIDE_PX * REPS
    big_svs = Path(tiff_dir) / "bench_big.svs"
    write_tiled_tiff(
        big_svs,
        [_mosaic(slide._levels[0], REPS), _mosaic(slide._levels[1], REPS)],
        tile_size=256, compression=7,
        description="Aperio bench |MPP = 0.2500|",
    )
    big_grid = _grid_for(BIG_PX)

    def run_decode():
        # fresh reader each iteration: no warm LRU carry-over between runs
        reader = TiffTileSlide(svs_path, cache_tiles=512)
        n = 0
        for tiles, valid in iter_tile_batches(reader, grid, 224, 128,
                                              pad_to_batch=False, prefetch=2):
            n += int(valid.sum())
        assert n == len(grid)

    decode_rate = _median_rate(run_decode, len(grid))
    probe_reader = TiffTileSlide(svs_path)  # capability probes only — one
    # parse of the IFDs instead of a fresh reader per probe
    native_on = probe_reader._native is not None

    # planar host decode (no chroma upsample / color conversion on host —
    # the device finishes those): the host-side cost of the planar feed
    def run_decode_planar():
        reader = TiffTileSlide(svs_path, cache_tiles=512)
        n = 0
        for payload, valid in iter_tile_batches(
            reader, grid, 224, 128, pad_to_batch=False, prefetch=2,
            planar=True,
        ):
            assert isinstance(payload, tuple)  # grid is even → all planar
            n += int(valid.sum())
        assert n == len(grid)

    decode_planar_rate = (
        _median_rate(run_decode_planar, len(grid))
        if probe_reader.supports_planar(0)
        else 0.0
    )

    # stage batch sizes = the pipeline defaults (config.py), which sit at
    # the measured v5e throughput knees
    embed_batch = 512
    tiles224 = np.stack(
        [
            slide.read_region((int(x), int(y)), 0, (224, 224))
            for x, y in rng.integers(0, SLIDE_PX - 224, size=(embed_batch, 2))
        ]
    )
    nuclei_batch = 128

    # --- embed stage: CLIP ViT-B/16 bf16 (batch = config knee) -------------
    encoder = ImageEncoder(CLIP_VIT_B16, dtype=jnp.bfloat16, seed=0)
    tiles224_dev = jnp.asarray(tiles224)

    def run_embed():
        return encoder(tiles224_dev)

    embed_rate = _median_rate(run_embed, embed_batch)

    # --- premium embedder: Virchow2 ViT-H/14 (the reference's production
    # tile embedder, extract_embedding_from_tiles.py:14 / tnbc_config.py:41)
    # at its measured v5e knee (config.embedding.virchow2_batch_size) ------
    from path_gene_multimodal_tpu.models.vit_timm import VIRCHOW2_TIMM

    vir_batch = 64
    vir_encoder = ImageEncoder(VIRCHOW2_TIMM, dtype=jnp.bfloat16, seed=0)
    tiles224_vir = jnp.asarray(tiles224[:vir_batch])

    def run_virchow2():
        return vir_encoder(tiles224_vir)

    virchow2_rate = _median_rate(run_virchow2, vir_batch)
    del vir_encoder  # ~1.3 GB of HBM back before the seg/molecular stages

    # --- molecular stage: 6-task IDaRS ResNet34 vmapped ensemble at its
    # knee (config.molecular.batch_size; molecular_feature_extraction.py) --
    from path_gene_multimodal_tpu.config import default_config
    from path_gene_multimodal_tpu.models.resnet import IDaRSEnsemble

    mol_batch = 256
    ensemble = IDaRSEnsemble(list(default_config().molecular.tasks))
    tiles224_mol = jnp.asarray(tiles224[:mol_batch])

    def run_molecular():
        return ensemble(tiles224_mol)

    molecular_rate = _median_rate(run_molecular, mol_batch)

    # --- nuclei stage: HoverNeXt tiny, TTA×4 forward on real tissue --------
    # heads ridge-fit on the slide (utils.headfit): the forward DETECTS the
    # slide's nuclei, so every downstream stage consumes real model output
    seg0 = NucleiModel.build(HOVERNEXT_TINY, tta=4, dtype=jnp.bfloat16)
    fit_tiles = sample_tissue_tiles(slide, 8, 256, seed=5, max_tries=1600,
                                    nucleus_colors=NUCLEUS_TYPE_COLORS)
    t_fit = time.perf_counter()
    fitted = fit_heads(HOVERNEXT_TINY, seg0.params, fit_tiles,
                       nucleus_colors=NUCLEUS_TYPE_COLORS)
    head_fit_sec = time.perf_counter() - t_fit
    seg = NucleiModel.build(
        HOVERNEXT_TINY, params=fitted, tta=4, dtype=jnp.bfloat16
    )

    tiles256 = sample_tissue_tiles(slide, nuclei_batch, 256, seed=7,
                                   max_tries=6000,
                                   nucleus_colors=NUCLEUS_TYPE_COLORS)
    tiles256_dev = jnp.asarray(tiles256)

    def run_seg_fwd():
        return seg._infer(seg.params, tiles256_dev)

    seg_fwd_rate = _median_rate(run_seg_fwd, len(tiles256))

    # --- watershed post-proc + features on the REAL forward outputs --------
    np_prob_d, hv_d, tp_d = seg._infer(seg.params, tiles256_dev)
    jax.block_until_ready((np_prob_d, hv_d, tp_d))

    @jax.jit
    def _pp(np_prob, hv, tp):
        lbl = seg._postproc_raw(np_prob, hv)
        feats = instance_features_batch(
            lbl.astype(jnp.int32), tp.astype(jnp.int32),
            max_instances=seg.max_instances, use_pallas=_pallas_ok(),
        )
        return feats["area"], feats["centroid_x"], feats["centroid_y"]

    areas, cents_x, cents_y = (
        np.asarray(a) for a in _pp(np_prob_d, hv_d, tp_d)
    )
    n_found = int((areas > 0).sum())
    assert n_found > 0, "fitted forward produced no instances"

    def run_pp():
        return _pp(np_prob_d, hv_d, tp_d)

    pp_rate = _median_rate(run_pp, len(tiles256))

    nuclei_rate = 1.0 / (1.0 / seg_fwd_rate + 1.0 / pp_rate)

    # --- graph stage: kNN(k=5) + 40µm radius graph over the pp nuclei ------
    # (north star is tile→embed→nuclei→GRAPH, BASELINE.md:18). Workload:
    # the real detected nuclei, laid out in slide coordinates.
    pts = []
    for bi in range(len(tiles256)):
        live = areas[bi] > 0
        cx = cents_x[bi][live] + (bi % 8) * 256
        cy = cents_y[bi][live] + (bi // 8) * 256
        pts.append(np.stack([cx, cy], axis=1))
    pts = np.concatenate(pts).astype(np.float32)
    radius_px = 40.0 / 0.25  # 40 µm at mpp 0.25 (notebook cells 23-27)

    def run_graph():
        combined_graphs(pts, k=5, radius=radius_px)  # uncapped = reference ball query

    graph_rate = _median_rate(run_graph, len(tiles256))

    # --- canonical sliding-window WSI mode (SURVEY §3.4): window 256,
    # stride 248 over the whole slide — JPEG decode → TTA×4 forward →
    # watershed → exactly-once stitcher → nuclei table + instance-map
    # write, the reference's hovernet_inference.py:173-209 configuration --
    from path_gene_multimodal_tpu.pipeline.nuclei_wsi import (
        iter_windows,
        run_hovernext_wsi,
    )
    from path_gene_multimodal_tpu.utils.log import StageTimer

    wsi_cfg = default_config()
    n_windows = len(iter_windows(SLIDE_PX, SLIDE_PX, 256, 248))
    sliding_dir = Path(tempfile.mkdtemp(prefix="bench_sliding_"))
    run_hovernext_wsi(  # warmup: compiles segment_async's postproc program
        TiffTileSlide(svs_path, cache_tiles=512), sliding_dir, "warm", seg,
        wsi_cfg,
    )
    timer = StageTimer()
    t0 = time.perf_counter()
    _, sliding_nuclei = run_hovernext_wsi(
        TiffTileSlide(svs_path, cache_tiles=512), sliding_dir, "timed", seg,
        wsi_cfg, timer=timer,
    )
    sliding_sec = time.perf_counter() - t0
    # the segment loop overlaps decode / device dispatch / host
    # row-building; everything after it (seam dedup, renumbering, table +
    # dense-map + zarr writes) is serial host work — the stitcher share
    # the round-4 review asked to see
    seg_loop_sec = timer.report()["hovernext_wsi_segment"]["seconds"]
    shutil.rmtree(sliding_dir, ignore_errors=True)

    # --- combined serial path: decode → embed → nuclei → graph -------------
    composed = 1.0 / (
        1.0 / decode_rate + 1.0 / embed_rate + 1.0 / nuclei_rate + 1.0 / graph_rate
    )

    # --- MEASURED streamed WSI run (one chain, same tile stream) -----------
    # The real thing: JPEG bytes → decoded batches → embed + HoverNeXt
    # forward + watershed + instance features per batch (async dispatch
    # overlaps host decode with device compute) → kNN/radius graph over the
    # accumulated nuclei. Every map the watershed consumes is what the
    # fitted network produced from the tile bytes.
    stream_batch = nuclei_batch  # the nuclei knee (config) ties the chain

    # planar 4:2:0 device feed: raw Y+CbCr planes over the link (HALF the
    # bytes of RGB), chroma upsample + color conversion on device — the
    # H2D link (PCIe in production; ~25-70 MB/s on the dev tunnel) is the
    # streamed chain's narrowest resource
    from path_gene_multimodal_tpu.ops.jpegcolor import (
        ycbcr420_to_rgb_jit as _planes_to_rgb,  # shared program with the
    )  # pipeline feeds — one compile per plane shape across all consumers

    planar_feed = probe_reader.supports_planar(0)

    @jax.jit
    def _pad224_to_256(tiles_u8):
        # derive the seg window from the SAME uploaded batch on device —
        # one H2D per batch instead of two (uploading both views costs
        # 22 MB/batch; the dev tunnel moves ~25 MB/s, and even on an
        # attached chip one transfer is strictly better)
        return jnp.pad(
            tiles_u8, ((0, 0), (16, 16), (16, 16), (0, 0)), mode="reflect"
        )

    @jax.jit
    def _pp_pack(np_real, hv_real, tp_real):
        lbl = seg._postproc_raw(np_real, hv_real)
        feats = instance_features_batch(
            lbl.astype(jnp.int32), tp_real.astype(jnp.int32),
            max_instances=seg.max_instances, use_pallas=_pallas_ok(),
        )
        # pack instance stats to ONE uint16 tensor on device (areas < 2¹⁶;
        # centroids ×128 → 1/128-px quantization) — the production
        # compact-D2H convention; 6× fewer bytes than three f32 arrays
        return jnp.stack(
            [jnp.clip(feats["area"], 0, 65535),
             feats["centroid_x"] * 128.0,
             feats["centroid_y"] * 128.0], axis=-1,
        ).astype(jnp.uint16)

    def make_run_streamed(path: Path, grid_arr: np.ndarray, passes: int = 1):
        """``passes`` > 1 re-streams the same slide, offsetting each pass's
        nuclei by a pass-sized y shift (a slide cohort laid end-to-end) —
        tile-LRU, host memory, and the ~10⁶-nuclei graph then run at the
        100k-tile scale in ONE chain instead of being extrapolated."""
        pass_dy = float(grid_arr[:, 1].max() + 224)

        def run_streamed() -> tuple[float, int, int]:
            t0 = time.perf_counter()
            pts_parts = []
            n_tiles = 0
            for p in range(passes):
                reader = TiffTileSlide(path, cache_tiles=512)
                embs, feats = [], []
                for tiles, valid in iter_tile_batches(
                    reader, grid_arr, 224, stream_batch, pad_to_batch=True,
                    prefetch=2, planar=planar_feed,
                ):
                    n_tiles += int(valid.sum())
                    if isinstance(tiles, tuple):  # planar: half-bandwidth
                        tiles_dev = _planes_to_rgb(  # upload, finish on device
                            jnp.asarray(tiles[0]), jnp.asarray(tiles[1])
                        )
                    else:
                        tiles_dev = jnp.asarray(tiles)  # ONE async upload/batch
                    emb = encoder(tiles_dev)
                    np_real, hv_real, tp_real = seg._infer(
                        seg.params, _pad224_to_256(tiles_dev)
                    )
                    f = _pp_pack(np_real, hv_real, tp_real)
                    # start the host copies NOW: they complete behind later
                    # batches' compute, so the end-of-run drain only waits
                    # for the final batch (jax enqueues the copy after the
                    # producing op)
                    emb.copy_to_host_async()
                    f.copy_to_host_async()
                    feats.append(f)
                    embs.append(emb)
                # copies already in flight — np.asarray just collects them
                _ = [np.asarray(e) for e in embs]
                acc = np.concatenate([np.asarray(f) for f in feats])
                acc = acc[: len(grid_arr)]  # drop final-batch padding
                a = acc[..., 0]
                tile_idx, _slot = np.nonzero(a > 0)
                cx = acc[..., 1][a > 0].astype(np.float32) / 128.0
                cy = acc[..., 2][a > 0].astype(np.float32) / 128.0
                pts_parts.append(
                    np.stack(
                        [cx + grid_arr[tile_idx, 0],
                         cy + grid_arr[tile_idx, 1] + p * pass_dy],
                        axis=1,
                    ).astype(np.float32)
                )
            pts_s = np.concatenate(pts_parts)
            combined_graphs(pts_s, k=5, radius=radius_px)
            return time.perf_counter() - t0, n_tiles, len(pts_s)

        return run_streamed

    make_run_streamed(svs_path, grid)()  # warmup: compile every program
    # median-of-3: the dev tunnel's H2D/D2H bandwidth swings
    # minute-to-minute (measured 7-67 MB/s); the median long run is a
    # robust sample that, unlike the previous min-of-2, cannot ride an
    # unusually good weather window
    run_big = make_run_streamed(big_svs, big_grid)
    runs = [run_big() for _ in range(3)]
    wsi_sec = float(np.median([sec for sec, _, _ in runs]))
    wsi_tiles = runs[0][1]
    wsi_nuclei = runs[0][2]
    wsi_rate = wsi_tiles / wsi_sec

    # --- optional 100k-tile single-chip streamed run (PGM_BENCH_FULL=1) ----
    # the SAME chain over 9 consecutive passes of the big slide (~107k
    # tiles, one accumulated ~10⁶-nuclei cohort graph): observes tile-LRU,
    # host memory, and graph accumulation at the north-star scale instead
    # of extrapolating ×9 from one 11,881-tile pass
    full_run = None
    if os.environ.get("PGM_BENCH_FULL") == "1":
        fsec, ftiles, fnuclei = make_run_streamed(big_svs, big_grid, passes=9)()
        full_run = {
            "wsi_full_tiles": int(ftiles),
            "wsi_full_sec": round(fsec, 1),
            "wsi_full_tiles_per_sec": round(ftiles / fsec, 2),
            "wsi_full_nuclei": int(fnuclei),
        }

    # --- full per-WSI pipeline (runner + nuclei + molecular + graph) -------
    runner_secs = measure_full_pipeline(seg, ensemble)

    # --- analytic FLOPs → MFU for every model-bound stage (utils.flops):
    # each tiles/s rate is also reported as the fraction of the chip's
    # 197 bf16 TFLOPS it sustains, so "is this actually fast?" is
    # answerable from this JSON alone and per-stage regressions cannot
    # hide inside tile-size or batch changes ------------------------------
    from path_gene_multimodal_tpu.models.resnet import RESNET34_IDARS
    from path_gene_multimodal_tpu.utils.flops import (
        hovernext_flops,
        mfu,
        resnet_flops,
        vit_flops,
    )

    embed_fc = vit_flops(CLIP_VIT_B16)
    vir_fc = vit_flops(VIRCHOW2_TIMM)
    seg_fc = hovernext_flops(HOVERNEXT_TINY, tta=4)
    mol_fc = resnet_flops(RESNET34_IDARS, num_models=6)
    flops_detail = {
        "embed_gflops_per_tile": round(embed_fc.total_flops / 1e9, 2),
        "embed_mfu": round(mfu(embed_rate, embed_fc.total_flops), 4),
        "embed_virchow2_gflops_per_tile": round(vir_fc.total_flops / 1e9, 2),
        "embed_virchow2_mfu": round(mfu(virchow2_rate, vir_fc.total_flops), 4),
        "seg_forward_gflops_per_tile": round(seg_fc.total_flops / 1e9, 2),
        # dw-conv MACs ride the ~7.5 TFLOP/s VPU, not the MXU — reported
        # split so the MFU ceiling argument (docs/ROOFLINE.md) is checkable
        "seg_forward_vpu_gflops_per_tile": round(seg_fc.vpu_flops / 1e9, 2),
        "seg_forward_mfu": round(mfu(seg_fwd_rate, seg_fc.total_flops), 4),
        "molecular_gflops_per_tile": round(mol_fc.total_flops / 1e9, 2),
        "molecular_mfu": round(mfu(molecular_rate, mol_fc.total_flops), 4),
    }

    # measured multi-device evidence for the v5e-8 extrapolation (tools/
    # dp_scaling.py on the 8-virtual-device mesh: collective audit + FLOP
    # partition + sharding-tax wall ratio), refreshed when present
    dp_evidence = None
    dp_path = Path(__file__).parent / "DP_SCALING.json"
    if dp_path.exists():
        dp = json.loads(dp_path.read_text())
        dp_evidence = {
            "collective_ops_8dev": dp["per_mesh"]["8"]["total_collective_ops"],
            "flops_partition_ratio": dp["flops_partition_ratio"],
            "walltime_ratio_8dev_vs_1dev": dp["walltime_ratio_8dev_vs_1dev"],
            "verdict": dp["verdict"],
        }

    print(
        json.dumps(
            {
                "metric": "wsi_streamed_tiles_per_sec_per_chip",
                "value": round(wsi_rate, 2),
                "unit": "tiles/s/chip, MEASURED streamed WSI chain over "
                f"{wsi_tiles} tiles (JPEG decode + embed ViT-B/16 bf16 + "
                "HoverNeXt tiny TTAx4 + watershed + instance features + "
                "kNN/radius graph, real forward outputs end-to-end)",
                "vs_baseline": round(wsi_rate / TARGET_TILES_PER_SEC_PER_CHIP, 3),
                "detail": {
                    "decode_tiles_per_sec": round(decode_rate, 2),
                    "decode_planar_tiles_per_sec": round(decode_planar_rate, 2),
                    "native_decoder": native_on,
                    "embed_tiles_per_sec": round(embed_rate, 2),
                    "embed_virchow2_tiles_per_sec": round(virchow2_rate, 2),
                    "molecular_tiles_per_sec": round(molecular_rate, 2),
                    "nuclei_tiles_per_sec": round(nuclei_rate, 2),
                    "seg_forward_tiles_per_sec": round(seg_fwd_rate, 2),
                    "postproc_tiles_per_sec": round(pp_rate, 2),
                    "graph_tiles_per_sec": round(graph_rate, 2),
                    "composed_tiles_per_sec": round(composed, 2),
                    # canonical stride-248 sliding-window WSI mode
                    "wsi_sliding_tiles_per_sec": round(
                        n_windows / sliding_sec, 2
                    ),
                    "wsi_sliding_windows": int(n_windows),
                    "wsi_sliding_sec": round(sliding_sec, 3),
                    "wsi_sliding_segment_loop_sec": round(seg_loop_sec, 3),
                    "wsi_sliding_stitch_finalize_sec": round(
                        sliding_sec - seg_loop_sec, 3
                    ),
                    "wsi_sliding_nuclei": int(len(sliding_nuclei)),
                    **flops_detail,
                    "wsi_run_secs": [round(s, 3) for s, _, _ in runs],
                    "wsi_e2e_sec": round(wsi_sec, 3),
                    "wsi_tiles": int(wsi_tiles),
                    "wsi_tiles_per_sec": round(wsi_rate, 2),
                    "wsi_nuclei_found": int(wsi_nuclei),
                    "head_fit_sec": round(head_fit_sec, 2),
                    "planar_feed": bool(planar_feed),
                    # north star (BASELINE.md): 100k-tile WSI < 300 s on
                    # v5e-8 — from the MEASURED ≥10k-tile streamed rate;
                    # the linear-scaling premise is itself measured, not
                    # asserted: dp_scaling_evidence below (zero collectives
                    # in the compiled 8-device per-tile chain, exact 1/8
                    # FLOP partition, no sharding wall-time tax)
                    "wsi_100k_sec_v5e8_extrapolated": round(
                        100_000 / (8 * wsi_rate), 1
                    ),
                    **({"dp_scaling_evidence": dp_evidence}
                       if dp_evidence else {}),
                    **(full_run or {}),
                    "graph_nuclei": int(len(pts)),
                    "instances_in_pp_workload": n_found,
                    "target_tiles_per_sec_per_chip": round(
                        TARGET_TILES_PER_SEC_PER_CHIP, 2
                    ),
                    "backend": jax.default_backend(),
                    **runner_secs,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
