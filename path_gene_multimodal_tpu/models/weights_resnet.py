"""torchvision-style ResNet34 state_dict → Flax variables.

Covers the TIAToolbox ``resnet34-idars-*`` checkpoints the reference loads
per task (``molecular_feature_extraction.py:123-134``). BatchNorm running
stats go to the ``batch_stats`` collection (inference uses running
averages, matching torch ``.eval()``).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from path_gene_multimodal_tpu.models.resnet import ResNetConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd: Mapping, key: str) -> dict:
    return {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)}


def _bn(sd: Mapping, prefix: str) -> tuple[dict, dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_resnet34(
    sd: Mapping[str, np.ndarray], cfg: ResNetConfig = ResNetConfig()
) -> dict:
    """→ {"params": ..., "batch_stats": ...} for ``models.resnet.ResNet``."""
    # tolerate common prefixes ("model.", "module.")
    for prefix in ("model.", "module."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}
    params["stem_conv"] = _conv(sd, "conv1.weight")
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "bn1")
    for s, blocks in enumerate(cfg.stage_sizes):
        for b in range(blocks):
            t = f"layer{s + 1}.{b}"
            name = f"stage{s}_block{b}"
            blk_p: dict = {
                "conv1": _conv(sd, f"{t}.conv1.weight"),
                "conv2": _conv(sd, f"{t}.conv2.weight"),
            }
            blk_s: dict = {}
            blk_p["bn1"], blk_s["bn1"] = _bn(sd, f"{t}.bn1")
            blk_p["bn2"], blk_s["bn2"] = _bn(sd, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                blk_p["down_conv"] = _conv(sd, f"{t}.downsample.0.weight")
                blk_p["down_bn"], blk_s["down_bn"] = _bn(sd, f"{t}.downsample.1")
            params[name] = blk_p
            stats[name] = blk_s
    params["fc"] = {"kernel": _np(sd["fc.weight"]).T, "bias": _np(sd["fc.bias"])}
    return {"params": params, "batch_stats": stats}
