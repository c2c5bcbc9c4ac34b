"""Multi-slide batch runner for the 8-step pipeline.

The reference scales across slides only via one-slide-per-LSF-job
(``main.py:322-326``). This runner adds the single-node batch mode: loop a
slide list with ONE long-lived model bundle (no per-slide rebuilds), honor
the same lock/done protocol so it can run alongside array-job workers on a
shared filesystem, and append success/error audit logs (the molecular
loop's pattern, ``run_molecular_loop.py:101-155``, applied to the main
pipeline).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from path_gene_multimodal_tpu.config import default_config, slide_paths
from path_gene_multimodal_tpu.utils.log import get_logger


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-path", default=None, help="directory of WSIs")
    ap.add_argument("--slide-list", default=None, help="file with one WSI path per line")
    ap.add_argument("--outroot", default=None)
    ap.add_argument("--no-locks", action="store_true")
    ap.add_argument("--limit", type=int, default=None, help="max slides this run")
    ap.add_argument(
        "--dp", action="store_true",
        help="data-parallel embedding over a tile-axis mesh of all local "
             "devices (same flag as pgm-tpu --dp)",
    )
    args = ap.parse_args(argv)

    from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    logger = get_logger()
    cfg = default_config()
    outroot = Path(args.outroot or cfg.outroot or "out")

    if args.slide_list:
        wsis = [Path(l.strip()) for l in Path(args.slide_list).read_text().splitlines() if l.strip()]
    else:
        wsis = slide_paths(args.data_path or cfg.data_path)
    if not wsis:
        logger.error("no slides to process")
        return 2
    if args.limit is not None:  # `if args.limit:` would make --limit 0 = ALL
        wsis = wsis[: args.limit]

    from path_gene_multimodal_tpu.pipeline.runner import PipelineModels, run_one_wsi

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
    models = PipelineModels.build(cfg, mesh=mesh)  # once for the whole batch
    outroot.mkdir(parents=True, exist_ok=True)
    counts = {"done": 0, "already_done": 0, "locked": 0, "error": 0}
    with open(outroot / "success_slides.txt", "a") as success_log, \
         open(outroot / "error_slides.txt", "a") as error_log:
        for wsi in wsis:
            result = run_one_wsi(wsi, outroot, cfg, models=models,
                                 use_locks=not args.no_locks)
            counts[result.status] = counts.get(result.status, 0) + 1
            if result.status == "done":
                success_log.write(f"{result.stem}\n")
                success_log.flush()
            elif result.status == "error":
                error_log.write(f"{result.stem}\t{result.error}\n")
                error_log.flush()
    logger.info("batch done: %s", counts)
    return 0 if counts["error"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
