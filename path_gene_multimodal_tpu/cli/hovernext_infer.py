"""Standalone HoverNeXt inference CLI — the reference's
``hovernet_inference.py`` script entry (SURVEY.md §2 C11, §3.4).

Two modes, matching the reference's input types (``get_input_type``):

- ``--mode wsi`` (canonical): sliding-window whole-slide segmentation
  (window 256, stride = window × overlap — the script-config
  ``tile_size=256, overlap=0.96875``), producing the slide-scale instance
  map + nuclei table;
- ``--mode tiles``: per-tile run over TME-ROI tiles from an annotations
  CSV (the ``aggregated_hovernet_run`` path).

Reference-named knobs: ``--tile-size``, ``--overlap``, ``--tta``,
``--batch-size``; checkpoint ingestion via ``--checkpoint`` (torch
state_dict) when available, random init otherwise (clearly logged).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

from path_gene_multimodal_tpu.utils.log import get_logger


def resolve_inputs(spec: str) -> list[Path]:
    """Reference ``prepare_input`` semantics (hovernet_inference.py:22-59):
    a ``.txt`` file = one input path per line; anything else is a glob
    pattern (a plain existing path matches itself). Raises on empty lists
    and unmatched patterns exactly like the reference."""
    if spec.endswith(".txt"):
        p = Path(spec)
        if not p.exists():
            raise FileNotFoundError(f"input text file not found: {spec}")
        inputs = [Path(s.strip()) for s in p.read_text().splitlines() if s.strip()]
        if not inputs:
            raise ValueError(f"{spec} is empty or contains no valid paths")
        return inputs
    import glob as _glob

    matches = sorted(_glob.glob(spec.rstrip()))
    if not matches:
        raise ValueError(f"no files found matching pattern: {spec}")
    return [Path(m) for m in matches]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--input", required=True,
        help="WSI/image/.npy path, a glob pattern, or a .txt list of paths "
             "(one per line) — the reference's prepare_input surface",
    )
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--mode", choices=["wsi", "tiles"], default="wsi")
    ap.add_argument("--annotations-csv", default=None,
                    help="required for --mode tiles")
    ap.add_argument(
        "--checkpoint", default=None,
        help="torch checkpoint to convert on the fly, or a torch-free .npz "
             "artifact written by cli.convert_weights (kind=hovernext)",
    )
    ap.add_argument(
        "--allow-pickle", action="store_true",
        help="permit full unpickling for trusted checkpoints that "
        "weights_only loading cannot read (unpickling can execute code)",
    )
    ap.add_argument("--tile-size", type=int, default=256)
    ap.add_argument("--overlap", type=float, default=0.96875)
    ap.add_argument("--tta", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--only-inference", action="store_true",
                    help="skip artifacts; report timings only")
    ap.add_argument(
        "--exact-gelu", action="store_true",
        help="use the reference's exact-erf GELU (torch nn.GELU) instead "
             "of the default tanh approximation — bit-level parity runs; "
             "costs ~17%% seg throughput on TPU (the tanh drift is below "
             "bf16 rounding; ConvNeXtConfig.exact_gelu docstring)",
    )
    ap.add_argument(
        "--dp", action="store_true",
        help="data-parallel over all local devices: replicate the model "
             "weights and shard each window batch over a tile-axis mesh "
             "(--batch-size must be a multiple of the device count; the WSI "
             "loop's static batches already pad to the full size)",
    )
    args = ap.parse_args(argv)
    logger = get_logger()
    # trivial usage errors must fail BEFORE setup_jax/model build (first
    # compiles cost minutes over a remote link)
    if args.mode == "tiles" and not args.annotations_csv:
        logger.error("--mode tiles requires --annotations-csv")
        return 2
    try:
        inputs = resolve_inputs(args.input)
    except (FileNotFoundError, ValueError) as e:
        logger.error("%s", e)
        return 2
    missing = [p for p in inputs if not p.exists()]
    if missing:
        logger.error("input not found: %s", ", ".join(map(str, missing)))
        return 2
    if args.mode == "tiles" and len(inputs) > 1:
        logger.error("--mode tiles takes a single input (got %d; one "
                     "--annotations-csv cannot describe several slides)",
                     len(inputs))
        return 2

    from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

    setup_jax()

    from path_gene_multimodal_tpu.config import default_config
    from path_gene_multimodal_tpu.io.slide import open_slide
    from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig
    from path_gene_multimodal_tpu.pipeline.nuclei import (
        NucleiModel,
        run_hovernet_pipeline_on_wsi_tiles,
    )
    from path_gene_multimodal_tpu.pipeline.nuclei_wsi import run_hovernext_wsi

    from dataclasses import replace as _dc_replace

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)  # tiles mode writes csv/
    # parquet directly without creating parents — fail here, not after hours
    cfg = default_config()
    # dataclasses.replace, NOT __class__(...): reconstructing would reset
    # the non-CLI fields (checkpoint, pp_*, max_instances, planar_feed)
    cfg = cfg.replace(
        hovernext=_dc_replace(
            cfg.hovernext,
            tile_size=args.tile_size, overlap=args.overlap,
            tta=args.tta, batch_size=args.batch_size,
        )
    )

    mcfg = HoverNeXtConfig(input_size=cfg.hovernext.tile_size)
    params = None
    real = False
    if args.checkpoint:
        from dataclasses import replace as dc_replace

        from path_gene_multimodal_tpu.core.checkpoints import (
            load_converted,
            load_hovernext_from_torch,
        )
        from path_gene_multimodal_tpu.models.hovernext_real import RealHoverNeXtConfig

        if args.checkpoint.endswith(".npz"):  # converted artifact: no torch
            kind, loaded_cfg, params = load_converted(args.checkpoint)
            if kind != "hovernext":
                logger.error("%s is a %r artifact, expected kind=hovernext",
                             args.checkpoint, kind)
                return 2
        else:
            loaded_cfg, params = load_hovernext_from_torch(
                args.checkpoint, allow_pickle=args.allow_pickle
            )
        mcfg = dc_replace(loaded_cfg, input_size=cfg.hovernext.tile_size)
        real = isinstance(loaded_cfg, RealHoverNeXtConfig)
        if real:
            logger.info(
                "loaded REAL-layout hover_next from %s (encoder dims %s, "
                "branches %s)", args.checkpoint, mcfg.encoder.dims, mcfg.branches,
            )
        else:
            logger.info(
                "loaded pretrained HoverNeXt from %s (encoder dims %s, %d types)",
                args.checkpoint, mcfg.encoder.dims, mcfg.num_types,
            )
    else:
        logger.warning("no --checkpoint given: running with RANDOM weights "
                       "(plumbing/benchmark mode, not biology)")
    if args.exact_gelu:
        from dataclasses import replace as _dcr

        mcfg = _dcr(mcfg, encoder=_dcr(mcfg.encoder, exact_gelu=True))
    mesh = None
    if args.dp:
        from path_gene_multimodal_tpu.parallel.mesh import dp_mesh_for_batch

        try:
            mesh = dp_mesh_for_batch(
                args.batch_size, logger=logger, label="--batch-size"
            )
        except ValueError as e:
            logger.error("%s", e)
            return 2
    if real:
        from path_gene_multimodal_tpu.pipeline.nuclei import RealNucleiModel

        model = RealNucleiModel.build(
            mcfg, params=params, tta=args.tta, mesh=mesh,
            max_instances=cfg.hovernext.max_instances_per_tile,
        )
    else:
        model = NucleiModel.build(
            mcfg, params=params, tta=args.tta, mesh=mesh,
            max_instances=cfg.hovernext.max_instances_per_tile,
        )

    # ONE model for the whole input list (the reference rebuilt the model
    # per input — the per-tile-reload anti-pattern, SURVEY.md §7); multiple
    # inputs write into per-stem subdirectories. Duplicate stems across
    # directories (cohortA/case7.svs + cohortB/case7.svs) get a numeric
    # suffix so one slide's artifacts never overwrite another's.
    stems: list[str] = []
    seen: dict[str, int] = {}
    for wsi in inputs:
        n = seen.get(wsi.stem, 0)
        seen[wsi.stem] = n + 1
        stem = wsi.stem if n == 0 else f"{wsi.stem}_{n + 1}"
        if n == 1:
            logger.warning(
                "duplicate input stem %r: later inputs write under %s_2, "
                "%s_3, ...", wsi.stem, wsi.stem, wsi.stem,
            )
        stems.append(stem)

    failed = 0
    for wsi, stem in zip(inputs, stems):
        dest = out_dir if len(inputs) == 1 else out_dir / stem
        dest.mkdir(parents=True, exist_ok=True)
        t0 = time.perf_counter()
        try:
            slide = open_slide(wsi)
            try:
                if args.mode == "wsi":
                    map_path, nuclei = run_hovernext_wsi(
                        slide, dest, stem, model, cfg,
                        batch_size=args.batch_size,
                        write_artifacts=not args.only_inference,
                    )
                else:
                    nuclei = run_hovernet_pipeline_on_wsi_tiles(
                        slide, args.annotations_csv, dest, stem, model, cfg,
                        batch_size=args.batch_size,
                        write_artifacts=not args.only_inference,
                    )
            finally:
                # a .txt list can name hundreds of slides — one leaked fd each
                close = getattr(slide, "close", None)
                if close is not None:
                    close()
        except Exception as e:
            # one corrupt slide must not abort a 300-slide list (the
            # reference's batch loops fail soft the same way,
            # run_molecular_loop.py:147-153); single-input runs re-raise
            # so the user sees the full traceback
            if len(inputs) == 1:
                raise
            failed += 1
            logger.error("%s: FAILED (%s: %s) — continuing",
                         wsi, type(e).__name__, e)
            continue
        dt = time.perf_counter() - t0
        logger.info("%s: inference+postproc: %d nuclei in %.1fs",
                    stem, len(nuclei), dt)
    if failed:
        logger.error("%d/%d inputs failed", failed, len(inputs))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
