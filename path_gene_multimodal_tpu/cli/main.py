"""Primary CLI — the reference's ``main.py`` entry point.

Contract parity (``main.py:320-364``): the slide to process comes from the
``WSI_PATH`` environment variable (set per-task by an LSF/Slurm array job)
or ``--wsi``; output root from config or ``--outroot``. Lock/done/error
files coordinate a fleet of independent workers over a shared filesystem.

Usage:
    WSI_PATH=/data/slide.svs python -m path_gene_multimodal_tpu.cli.main
    python -m path_gene_multimodal_tpu.cli.main --wsi slide.svs --outroot out/
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

from path_gene_multimodal_tpu.config import WSI_EXTS, default_config
from path_gene_multimodal_tpu.pipeline.runner import PipelineModels, run_one_wsi
from path_gene_multimodal_tpu.utils.log import get_logger


def validate_wsi_path(wsi_path: str | Path) -> Path:
    """Existence + extension check (reference main.py:129-140)."""
    p = Path(wsi_path)
    if not p.exists():
        raise FileNotFoundError(f"WSI not found: {p}")
    if p.suffix.lower() not in WSI_EXTS | {".npz"}:
        raise ValueError(
            f"unsupported WSI extension {p.suffix!r} (expected one of {sorted(WSI_EXTS)})"
        )
    return p


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wsi", default=None, help="slide path (default: $WSI_PATH)")
    ap.add_argument("--outroot", default=None, help="output root directory")
    ap.add_argument("--no-locks", action="store_true", help="skip lock files")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the run into DIR")
    ap.add_argument(
        "--weights", default=None, metavar="NPZ",
        help="converted image-tower checkpoint from cli.convert_weights "
             "(kind clip or virchow2); CLIP text weights auto-load from "
             "<stem>_text.npz next to it. Without it the towers run with "
             "RANDOM weights (plumbing mode).",
    )
    ap.add_argument(
        "--dp", action="store_true",
        help="data-parallel embedding: replicate the image tower and shard "
             "each tile batch over a tile-axis mesh of all local devices "
             "(the embedding batch size must be a multiple of the device count)",
    )
    args = ap.parse_args(argv)

    from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    logger = get_logger()
    wsi = args.wsi or os.environ.get("WSI_PATH")
    if not wsi:
        logger.error("no slide given: set WSI_PATH or pass --wsi")
        return 2
    cfg = default_config()
    outroot = args.outroot or cfg.outroot or "out"

    try:
        wsi_path = validate_wsi_path(wsi)
    except (FileNotFoundError, ValueError) as e:
        logger.error("%s", e)
        return 2

    vision_cfg = vision_params = text_cfg = text_params = None
    weights_fp = None
    if args.weights:
        from path_gene_multimodal_tpu.core.checkpoints import (
            file_fingerprint,
            load_converted,
            text_sidecar_path,
        )

        weights_fp = file_fingerprint(args.weights)
        kind, vision_cfg, vision_params = load_converted(args.weights)
        if kind not in ("clip", "virchow2"):
            logger.error("%s is a %r artifact, expected kind clip|virchow2",
                         args.weights, kind)
            return 2
        tfile = text_sidecar_path(args.weights)
        if tfile.exists():
            _, text_cfg, text_params = load_converted(tfile)
            logger.info("loaded text tower from %s", tfile)
        logger.info("loaded %s image tower from %s", kind, args.weights)
    mesh = None
    if args.dp:
        from path_gene_multimodal_tpu.parallel.mesh import dp_mesh_for_batch

        try:
            mesh = dp_mesh_for_batch(
                cfg.embedding.batch_size, logger=logger, label="embedding batch"
            )
        except ValueError as e:
            logger.error("%s", e)
            return 2
    models = PipelineModels.build(
        cfg, vision_params=vision_params, vision_cfg=vision_cfg,
        text_cfg=text_cfg, text_params=text_params,
        weights_fingerprint=weights_fp, mesh=mesh,
    )
    if args.profile:
        import contextlib

        import jax.profiler

        profile_ctx = jax.profiler.trace(args.profile)
    else:
        import contextlib

        profile_ctx = contextlib.nullcontext()
    with profile_ctx:
        result = run_one_wsi(
            wsi_path, outroot, cfg, models=models, use_locks=not args.no_locks
        )
    logger.info("slide %s: %s (%d tiles, %d polygons)",
                result.stem, result.status, result.num_tiles, result.num_polygons)
    return 0 if result.status in ("done", "already_done") else 1


if __name__ == "__main__":
    sys.exit(main())
