"""Molecular batch loop — the reference's ``run_molecular_loop.py``.

Walks every WSI under the data path, skips slides without an annotations
CSV or already done (3-tier detection: ``_DONE_MOLECULAR`` flag, the
molecular CSV, or the msi overlay — ``run_molecular_loop.py:67-99``), runs
``extract_molecular_features`` per slide with per-slide try/except
continue, and appends to ``success_slides.txt`` / ``error_slides.txt``
with flush (``:101-155``). The IDaRS ensemble is built once for the whole
loop (the reference reloads six models per slide).
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback
from pathlib import Path

from path_gene_multimodal_tpu.config import (
    DEFAULT_MOLECULAR_TASKS,
    default_config,
    slide_paths,
)
from path_gene_multimodal_tpu.utils.log import get_logger


def is_done(out_dir: Path, stem: str, cfg) -> bool:
    """3-tier done detection (run_molecular_loop.py:70-95)."""
    if (out_dir / f"{stem}.{cfg.done_flag_molecular.lstrip('.')}").exists():
        return True
    if (out_dir / f"{stem}_molecular_features.csv").exists():
        return True
    if (out_dir / f"{stem}_msi_overlay.png").exists():
        return True
    return False


def write_done_flag(out_dir: Path, stem: str, cfg) -> None:
    import json

    (out_dir / f"{stem}.{cfg.done_flag_molecular.lstrip('.')}").write_text(
        json.dumps({"status": "done", "timestamp": time.time()})
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--outroot", default=None)
    ap.add_argument("--tasks", nargs="*", default=None,
                    help=f"subset of {list(DEFAULT_MOLECULAR_TASKS)}")
    ap.add_argument(
        "--weights-dir", default=None, metavar="DIR",
        help="directory of converted resnet34 artifacts named <task>.npz "
             "(cli.convert_weights kind=resnet34, one per resnet34-idars-* "
             "checkpoint); tasks without a file run with RANDOM weights",
    )
    ap.add_argument(
        "--dp", action="store_true",
        help="data-parallel over all local devices: replicate the ensemble "
             "weights and shard each tile batch over a tile-axis mesh "
             "(batch size must divide the device count; the pipeline pads "
             "every batch to the full size)",
    )
    args = ap.parse_args(argv)

    from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    logger = get_logger()
    cfg = default_config()
    data_path = Path(args.data_path or cfg.data_path)
    outroot = Path(args.outroot or cfg.outroot or "out")
    tasks = args.tasks or list(cfg.molecular.tasks)

    from path_gene_multimodal_tpu.io.slide import open_slide
    from path_gene_multimodal_tpu.models.resnet import IDaRSEnsemble
    from path_gene_multimodal_tpu.pipeline.molecular import extract_molecular_features

    params_per_task = None
    if args.weights_dir:
        from path_gene_multimodal_tpu.core.checkpoints import load_converted
        from path_gene_multimodal_tpu.models.resnet import RESNET34_IDARS, ResNet

        wdir = Path(args.weights_dir)
        template = ResNet(RESNET34_IDARS)
        params_per_task = []
        for t in tasks:
            f = wdir / f"{t}.npz"
            if f.exists():
                kind, _, variables = load_converted(f)
                if kind != "resnet34":
                    logger.error("%s is a %r artifact, expected resnet34", f, kind)
                    return 2
                params_per_task.append(variables)
                logger.info("loaded %s weights from %s", t, f)
            else:
                import zlib

                import jax as _jax
                import jax.numpy as _jnp

                logger.warning("%s: no %s — RANDOM weights for this task", t, f)
                # crc32, not hash(): PYTHONHASHSEED randomizes str hashes per
                # process, which would make the fallback non-reproducible
                params_per_task.append(template.init(
                    _jax.random.PRNGKey(zlib.crc32(t.encode()) % 2**31),
                    _jnp.zeros((1, 224, 224, 3), _jnp.float32),
                ))
    mesh = None
    if args.dp:
        from path_gene_multimodal_tpu.parallel.mesh import dp_mesh_for_batch

        try:
            mesh = dp_mesh_for_batch(
                cfg.molecular.batch_size, logger=logger, label="molecular batch"
            )
        except ValueError as e:
            logger.error("%s", e)
            return 2
    # built ONCE for the loop (positional only when weights were loaded, so
    # duck-typed test ensembles keep their 1-arg constructor surface)
    ensemble = (IDaRSEnsemble(tasks, params_per_task, mesh=mesh)
                if params_per_task is not None
                else IDaRSEnsemble(tasks, mesh=mesh))
    wsis = slide_paths(data_path)
    if not wsis:
        logger.error("no WSIs under %s", data_path)
        return 2
    outroot.mkdir(parents=True, exist_ok=True)
    success_log = (outroot / "success_slides.txt").open("a")
    error_log = (outroot / "error_slides.txt").open("a")

    n_ok = n_skip = n_err = 0
    for wsi in wsis:
        stem = wsi.stem
        out_dir = outroot / stem
        csv = out_dir / f"{stem}_annotations_with_coords.csv"
        if not csv.exists():
            logger.info("skip %s: no annotations CSV", stem)
            n_skip += 1
            continue
        if is_done(out_dir, stem, cfg):
            logger.info("skip %s: already done", stem)
            n_skip += 1
            continue
        try:
            slide = open_slide(wsi)
            extract_molecular_features(slide, csv, out_dir, stem, ensemble, cfg)
            write_done_flag(out_dir, stem, cfg)
            success_log.write(f"{stem}\n")
            success_log.flush()
            n_ok += 1
        except Exception:
            error_log.write(f"{stem}\n{traceback.format_exc()}\n")
            error_log.flush()
            logger.exception("slide %s failed", stem)
            n_err += 1
    logger.info("molecular loop: %d ok, %d skipped, %d errors", n_ok, n_skip, n_err)
    return 0 if n_err == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
