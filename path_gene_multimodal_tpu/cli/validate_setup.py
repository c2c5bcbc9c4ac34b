"""Pre-run environment validation — the reference's ``validate_setup.py``
(SURVEY.md §2 C22), TPU edition:

1. path checks + WSI count (``:20-62``);
2. config invariants: TME_CLASSES ⊆ classes, positive sizes (``:65-109``);
3. import smoke test of the pipeline modules (``:112-137``);
4. accelerator check: ``jax.devices()`` reports a TPU/accelerator
   (``:140-165``'s CUDA check, TPU-native).

Exit code 0 when everything passes, 1 otherwise (``:210-221``).
"""

from __future__ import annotations

import argparse
import importlib
import sys
from pathlib import Path

from path_gene_multimodal_tpu.config import default_config, slide_paths
from path_gene_multimodal_tpu.utils.log import get_logger

PIPELINE_MODULES = (
    "path_gene_multimodal_tpu.pipeline.tessellate",
    "path_gene_multimodal_tpu.pipeline.embed",
    "path_gene_multimodal_tpu.pipeline.spatial",
    "path_gene_multimodal_tpu.pipeline.polygons",
    "path_gene_multimodal_tpu.pipeline.overlay",
    "path_gene_multimodal_tpu.pipeline.nuclei",
    "path_gene_multimodal_tpu.pipeline.molecular",
    "path_gene_multimodal_tpu.pipeline.graph",
)


def check_paths(cfg, logger) -> bool:
    ok = True
    if not cfg.data_path:
        logger.warning("DATA_PATH not configured")
    else:
        p = Path(cfg.data_path)
        if not p.exists():
            logger.error("DATA_PATH does not exist: %s", p)
            ok = False
        else:
            n = len(slide_paths(p))
            logger.info("DATA_PATH %s: %d WSIs", p, n)
            if n == 0:
                logger.error("no WSIs found under DATA_PATH")
                ok = False
    if cfg.outroot:
        Path(cfg.outroot).mkdir(parents=True, exist_ok=True)
    return ok


def check_config(cfg, logger) -> bool:
    ok = True
    if not set(cfg.tme_classes).issubset(set(cfg.classes)):
        logger.error("TME_CLASSES must be a subset of classes")
        ok = False
    if cfg.patch_size <= 0 or cfg.batch_size <= 0:
        logger.error("PATCH_SIZE and BATCH_SIZE must be positive")
        ok = False
    if cfg.thumb_size[0] <= 0 or cfg.thumb_size[1] <= 0:
        logger.error("THUMB_SIZE must be positive")
        ok = False
    if ok:
        logger.info("config invariants OK (%d classes, patch %d, batch %d)",
                    len(cfg.classes), cfg.patch_size, cfg.batch_size)
    return ok


def check_imports(logger) -> bool:
    ok = True
    for mod in PIPELINE_MODULES:
        try:
            importlib.import_module(mod)
        except Exception as e:
            logger.error("import failed: %s (%s)", mod, e)
            ok = False
    if ok:
        logger.info("all %d pipeline modules import", len(PIPELINE_MODULES))
    return ok


def check_accelerator(logger, require: bool = False) -> bool:
    import jax

    devices = jax.devices()
    kinds = {d.platform for d in devices}
    logger.info("jax devices: %s", devices)
    # 'axon' = the tunneled TPU backend (the production environment): the
    # device platform string is the plugin name, not 'tpu'
    if kinds & {"tpu", "gpu", "axon"} or any(
        "tpu" in str(getattr(d, "device_kind", "")).lower() for d in devices
    ):
        return True
    logger.warning("no accelerator — pipeline will run on CPU (slow)")
    return not require


def check_runtime_components(logger) -> bool:
    """Throughput/quality preflight beyond the reference's checks: the
    native C++ decoder and the real CLIP vocab both have graceful fallbacks
    (cv2 decode; the loud fallback tokenizer), so absence WARNS rather than
    fails — but a production fleet wants both present."""
    try:
        from path_gene_multimodal_tpu.io.native import NativeTileDecoder

        NativeTileDecoder()
        logger.info("native C++ tile decoder available")
    except Exception as e:
        logger.warning(
            "native tile decoder unavailable (%s) — decode falls back to "
            "cv2 (several× slower); build with `make -C native`", e,
        )
    try:
        from path_gene_multimodal_tpu.models.tokenizer import find_vocab_files

        found = find_vocab_files()
        if found:
            logger.info("CLIP vocab found: %s",
                        {k: str(v) for k, v in found.items()})
        else:
            logger.warning(
                "CLIP vocab not found — zero-shot annotation would use the "
                "non-CLIP fallback tokenizer (degraded); see README for the "
                "one-command fetch recipe"
            )
    except Exception as e:
        logger.warning("vocab discovery failed: %s", e)
    return True


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--require-accelerator", action="store_true")
    args = ap.parse_args(argv)
    from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

    setup_jax()  # repo convention: every entry point enables the compile cache
    logger = get_logger()
    cfg = default_config()
    if args.data_path:
        cfg = cfg.replace(data_path=args.data_path)
    results = [
        check_paths(cfg, logger),
        check_config(cfg, logger),
        check_imports(logger),
        check_runtime_components(logger),
        check_accelerator(logger, require=args.require_accelerator),
    ]
    if all(results):
        logger.info("validation PASSED")
        return 0
    logger.error("validation FAILED")
    return 1


if __name__ == "__main__":
    sys.exit(main())
