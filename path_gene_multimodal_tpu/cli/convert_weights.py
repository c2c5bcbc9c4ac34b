"""Convert published torch checkpoints to torch-free TPU artifacts.

One command turns each external checkpoint the reference consumes into a
single ``.npz`` (params + architecture config) that every TPU worker can
reload without torch installed (``core.checkpoints.load_converted``):

- ``hovernext``: ``pannuke_convnextv2_tiny_3`` (reference consumer
  ``hovernet_inference.py:82-131``) — auto-detects the published smp/timm
  multi-head layout vs the canonical TPU-native naming;
- ``clip`` / ``virchow2``: the tile-embedding towers
  (``extract_embedding_from_tiles.py:14``, MODEL_TYPE CLIP|Virchow2);
  CLIP text weights, when present, are written to ``<out>_text.npz``;
- ``resnet34``: the six ``resnet34-idars-*`` molecular predictors
  (``molecular_feature_extraction.py:21-28``) — run once per task file;
- ``convnext``: a bare FCMAE/timm ConvNeXtV2 encoder.

Usage::

    python -m path_gene_multimodal_tpu.cli.convert_weights \
        hovernext pannuke_convnextv2_tiny_3/best_model out/hovernext.npz

Conversion is strict by default: any checkpoint key the mapping does not
consume raises (a naming mismatch should be loud, not a silently
half-loaded model). ``--lenient`` downgrades that to a warning.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from path_gene_multimodal_tpu.utils.log import get_logger

KINDS = ("clip", "virchow2", "hovernext", "resnet34", "convnext")


def _n_params(variables) -> int:
    import jax
    import numpy as np

    return sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(variables))


def convert(kind: str, src: str | Path, out: str | Path,
            allow_pickle: bool = False, lenient: bool = False) -> list[Path]:
    """Programmatic entry — returns the written artifact paths."""
    from path_gene_multimodal_tpu.core import checkpoints as ck

    logger = get_logger()
    written: list[Path] = []
    strict = not lenient
    if kind == "clip":
        vcfg, vparams, tcfg, tparams = ck.load_clip_from_torch(
            src, allow_pickle=allow_pickle
        )
        written.append(ck.save_converted("clip", vcfg, vparams, out))
        if tparams is not None:
            tout = ck.text_sidecar_path(out)
            written.append(ck.save_converted("clip_text", tcfg, tparams, tout))
    elif kind == "virchow2":
        res = ck.load_virchow2_from_torch(src, strict=strict, allow_pickle=allow_pickle)
        cfg, variables = res[0], res[1]
        if not strict and res[2]:
            logger.warning("%d unconsumed checkpoint keys (lenient)", len(res[2]))
        written.append(ck.save_converted("virchow2", cfg, variables, out))
    elif kind == "hovernext":
        res = ck.load_hovernext_from_torch(src, strict=strict, allow_pickle=allow_pickle)
        cfg, variables = res[0], res[1]
        if not strict and res[2]:
            logger.warning("%d unconsumed checkpoint keys (lenient)", len(res[2]))
        written.append(ck.save_converted("hovernext", cfg, variables, out))
    elif kind == "resnet34":
        variables = ck.load_resnet_from_torch(src, allow_pickle=allow_pickle)
        written.append(ck.save_converted("resnet34", None, variables, out))
    elif kind == "convnext":
        cfg, variables, leftover = ck.load_convnext_encoder_from_torch(
            src, allow_pickle=allow_pickle
        )
        if leftover:
            msg = f"{len(leftover)} non-encoder keys not converted (decoder/head)"
            if strict:
                raise ValueError(msg + "; use kind=hovernext for full checkpoints "
                                       "or pass --lenient")
            logger.warning("%s (lenient)", msg)
        written.append(ck.save_converted("convnext", cfg, variables, out))
    else:
        raise ValueError(f"unknown kind {kind!r}")
    return written


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("kind", choices=KINDS)
    ap.add_argument("src", help="torch checkpoint (.pt/.pth/.bin/.safetensors)")
    ap.add_argument("out", help="output artifact path (.npz)")
    ap.add_argument(
        "--allow-pickle", action="store_true",
        help="permit full unpickling for trusted checkpoints that "
             "weights_only=True cannot read",
    )
    ap.add_argument(
        "--lenient", action="store_true",
        help="warn instead of raising on unconsumed checkpoint keys",
    )
    args = ap.parse_args(argv)
    logger = get_logger()

    from path_gene_multimodal_tpu.core.checkpoints import load_converted

    written = convert(args.kind, args.src, args.out,
                      allow_pickle=args.allow_pickle, lenient=args.lenient)
    for p in written:
        kind, cfg, variables = load_converted(p)  # read-back self-check
        logger.info(
            "wrote %s: kind=%s, %.1fM params, config=%s",
            p, kind, _n_params(variables) / 1e6, cfg,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
