"""End-to-end walkthrough — the reference's ``final_mussel.ipynb`` as a
runnable script on a synthetic slide (no external data or weights needed).

Covers every stage: synthetic WSI → tiled SVS on disk → 8-step pipeline
(tessellate → embed → class-embed → annotate → spatial/TME → polygons →
GeoJSON → overlays) → nuclei segmentation → molecular prediction → cell
graph → islands/burden metrics.

Run from the repo root:
    python examples/full_pipeline_demo.py [out_dir]

Random weights are used when no checkpoints are given, so predictions are
plumbing-grade, not biology — swap in converted torch checkpoints via
``core.checkpoints`` for real outputs.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

setup_jax()


def main() -> int:
    out_root = Path(sys.argv[1] if len(sys.argv) > 1 else "demo_out")
    out_root.mkdir(parents=True, exist_ok=True)

    import numpy as np

    from path_gene_multimodal_tpu.config import default_config
    from path_gene_multimodal_tpu.io.slide import open_slide, synthetic_wsi
    from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff
    from path_gene_multimodal_tpu.pipeline.runner import PipelineModels, run_one_wsi

    t0 = time.perf_counter()
    import jax

    # the production batch sizes are tuned for the TPU MXU; on the CPU
    # backend they turn a 2-minute demo into a half-hour compile-and-crawl,
    # so scale the workload to the backend
    on_cpu = jax.default_backend() == "cpu"
    slide_wh = (2048, 1536) if on_cpu else (4096, 3072)

    print(f"[1] synthesizing a slide and writing a real tiled SVS ({slide_wh[0]}x{slide_wh[1]}) ...")
    synth = synthetic_wsi(*slide_wh, seed=42, n_blobs=5, nuclei_per_blob=150)
    svs_path = out_root / "demo_case.svs"
    write_tiled_tiff(
        svs_path, [synth._levels[0], synth._levels[1], synth._levels[2]],
        tile_size=256, compression=7, description="Synthetic |MPP = 0.2500|",
    )

    print("[2] running the 8-step pipeline ...")
    from dataclasses import replace as dc_replace

    cfg = default_config()
    cfg = cfg.replace(
        tme_classes=cfg.classes,  # random weights: any class seeds ROI
        # dc_replace, NOT __class__(...): reconstructing would silently
        # reset every other field of the sub-config to class defaults
        polygon=dc_replace(cfg.polygon, min_polygon_area_px=0, area_min_tiles=0),
    )
    if on_cpu:
        cfg = cfg.replace(
            embedding=dc_replace(cfg.embedding, batch_size=64),
            hovernext=dc_replace(cfg.hovernext, batch_size=8),
        )
    models = PipelineModels.build(cfg)
    # fresh demo each run: clear any previous done flag so the pipeline
    # actually executes
    import shutil

    if (out_root / "demo_case").exists():
        shutil.rmtree(out_root / "demo_case")
    result = run_one_wsi(svs_path, out_root, cfg, models=models)
    print(f"    status={result.status} tiles={result.num_tiles} "
          f"polygons={result.num_polygons}")
    if result.status != "done":
        print(f"    error: {result.error}")
        return 1
    out_dir = result.out_dir
    stem = result.stem

    print("[3] nuclei segmentation over TME tiles ...")
    from path_gene_multimodal_tpu.models.hovernext import HOVERNEXT_TINY
    from path_gene_multimodal_tpu.pipeline.nuclei import (
        NucleiModel,
        run_hovernet_pipeline_on_wsi_tiles,
    )

    slide = open_slide(svs_path)
    if on_cpu:
        # random weights either way — a small config keeps the CPU compile
        # in seconds; on TPU run the production ConvNeXtV2-tiny
        from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig
        from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig

        seg_cfg = HoverNeXtConfig(
            encoder=ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(24, 48, 96, 192)),
            decoder_dims=(96, 48, 24, 16),
        )
    else:
        seg_cfg = HOVERNEXT_TINY
    seg = NucleiModel.build(
        seg_cfg, tta=cfg.hovernext.tta,
        max_instances=cfg.hovernext.max_instances_per_tile,
    )
    nuclei = run_hovernet_pipeline_on_wsi_tiles(
        slide, out_dir / f"{stem}_annotations_with_coords.csv",
        out_dir, stem, seg, cfg,
    )
    print(f"    {len(nuclei)} nuclei (random weights → usually 0)")

    print("[4] molecular (IDaRS) prediction ...")
    from path_gene_multimodal_tpu.models.resnet import IDaRSEnsemble
    from path_gene_multimodal_tpu.pipeline.molecular import extract_molecular_features

    if on_cpu:
        from path_gene_multimodal_tpu.models.resnet import ResNetConfig

        ensemble = IDaRSEnsemble(
            list(cfg.molecular.tasks),
            cfg=ResNetConfig(stage_sizes=(1, 1, 1, 1), width=16),
        )
    else:
        ensemble = IDaRSEnsemble(list(cfg.molecular.tasks))
    mol = extract_molecular_features(
        slide, out_dir / f"{stem}_annotations_with_coords.csv",
        out_dir, stem, ensemble, cfg,
    )
    prob_cols = [c for c in mol.features.columns if c.endswith("_prob")]
    print(f"    molecular columns: {prob_cols}")

    print("[5] spatial cell graph ...")
    from path_gene_multimodal_tpu.pipeline.graph import build_cell_graph

    if len(nuclei) >= 2:
        graph = build_cell_graph(nuclei, cfg.graph, out_dir, stem)
        print(f"    {len(graph.node_ids)} nodes, {graph.edge_index.shape[1]} edges")
    else:
        # demo continuity with random weights: synthesize a nuclei table
        import pandas as pd

        rng = np.random.default_rng(0)
        fake = pd.DataFrame(
            {
                "nuc_id": [f"n{i}" for i in range(500)],
                "type": rng.integers(1, 6, 500),
                "wsi_centroid_x": rng.uniform(0, slide_wh[0], 500),
                "wsi_centroid_y": rng.uniform(0, slide_wh[1], 500),
                "area": rng.uniform(40, 200, 500),
                "perimeter": rng.uniform(20, 70, 500),
                "eccentricity": rng.uniform(0, 0.9, 500),
                "solidity": rng.uniform(0.7, 1.0, 500),
                "major_axis_length": rng.uniform(8, 20, 500),
                "minor_axis_length": rng.uniform(4, 10, 500),
                "orientation": rng.uniform(-1.5, 1.5, 500),
            }
        )
        graph = build_cell_graph(fake, cfg.graph, out_dir, stem)
        print(f"    (synthetic table) {len(graph.node_ids)} nodes, "
              f"{graph.edge_index.shape[1]} edges")

    from path_gene_multimodal_tpu.pipeline.graph_stats import analyze_graph

    stats = analyze_graph(graph, out_dir, stem, n_perms=50)
    print(f"    stage-6 analysis: mean degree {stats['mean_degree']:.2f}, "
          f"mean clustering {stats['mean_clustering']:.3f}")

    print("[6] islands + burden metrics ...")
    from path_gene_multimodal_tpu.pipeline.morphology import (
        process_one_slide_make_csv_and_plot,
        write_basic_size_burden_metrics_txt,
    )

    classes = list(cfg.classes)
    islands = process_one_slide_make_csv_and_plot(
        slide, out_dir / f"{stem}.geojson", out_dir, stem,
        tumor_classes=classes[:2], til_classes=[classes[2]], tls_classes=[classes[3]],
    )
    write_basic_size_burden_metrics_txt(islands, stem, out_dir / f"{stem}_metrics.txt")

    print(f"\nall artifacts in {out_dir} ({time.perf_counter() - t0:.0f}s):")
    for p in sorted(out_dir.iterdir()):
        print(f"  {p.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
