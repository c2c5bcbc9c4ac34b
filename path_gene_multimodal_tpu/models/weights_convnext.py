"""torch ConvNeXtV2 state_dict → Flax ``models.convnext.ConvNeXtV2``.

Covers the timm/official-FCMAE ConvNeXtV2 naming used by HoverNeXt's
``pannuke_convnextv2_tiny_3`` encoder (reference hovernet_inference.py):

- ``downsample_layers.0.{0,1}`` = stem conv + LN
- ``downsample_layers.S.{0,1}`` (S ≥ 1) = LN + 2×2 stride-2 conv
- ``stages.S.B.{dwconv,norm,pwconv1,grn,pwconv2}`` per block, with GRN
  ``gamma``/``beta`` stored as (1, 1, 1, C)

Decoder/head weights of a HoverNeXt checkpoint are architecture-specific;
``convert_convnextv2`` returns the encoder subtree (usable standalone or
inside a partially-initialized ``HoverNeXt`` whose decoder fine-tunes),
plus the dict of unconsumed keys so callers can map decoders explicitly.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd: Mapping, key: str) -> dict:
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


# NOTE: torch depthwise (C, 1, kh, kw) transposes to the flax
# feature_group_count=C layout (kh, kw, 1, C) with the SAME permutation a
# regular conv uses — _conv serves both.


def _ln(sd: Mapping, key: str) -> dict:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _dense(sd: Mapping, key: str) -> dict:
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def infer_convnext_config(sd: Mapping[str, np.ndarray]) -> ConvNeXtConfig:
    dims = []
    depths = []
    s = 0
    while any(k.startswith(f"stages.{s}.") for k in sd):
        b = 0
        while f"stages.{s}.{b}.dwconv.weight" in sd:
            b += 1
        if b == 0:
            if any(k.startswith(f"stages.{s}.blocks.") for k in sd):
                raise ValueError(
                    "timm 'stages.S.blocks.B.conv_dw' naming: use "
                    "weights_hovernext_real.convert_convnextv2_timm (or "
                    "core.checkpoints.load_convnext_encoder_from_torch, "
                    "which auto-routes)"
                )
            break
        depths.append(b)
        dims.append(int(sd[f"stages.{s}.0.dwconv.weight"].shape[0]))
        s += 1
    if not depths:
        raise ValueError("no ConvNeXt stages found in state_dict")
    return ConvNeXtConfig(depths=tuple(depths), dims=tuple(dims))


def convert_convnextv2(
    sd: Mapping[str, np.ndarray], cfg: ConvNeXtConfig | None = None
) -> tuple[dict, dict]:
    """→ ({"params": encoder_params}, unconsumed_keys)."""
    # strip common prefixes (e.g. "encoder.", "backbone.", "module.")
    for prefix in ("module.", "encoder.", "backbone.", "model."):
        if any(k.startswith(prefix + "downsample_layers") for k in sd):
            sd = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}
    if cfg is None:
        cfg = infer_convnext_config(sd)
    consumed: set[str] = set()
    p: dict = {}
    p["stem_conv"] = _conv(sd, "downsample_layers.0.0")
    p["stem_norm"] = _ln(sd, "downsample_layers.0.1")
    consumed.update({"downsample_layers.0.0.weight", "downsample_layers.0.0.bias",
                     "downsample_layers.0.1.weight", "downsample_layers.0.1.bias"})
    for s in range(1, cfg.num_stages):
        p[f"down{s}_norm"] = _ln(sd, f"downsample_layers.{s}.0")
        p[f"down{s}_conv"] = _conv(sd, f"downsample_layers.{s}.1")
        consumed.update({
            f"downsample_layers.{s}.0.weight", f"downsample_layers.{s}.0.bias",
            f"downsample_layers.{s}.1.weight", f"downsample_layers.{s}.1.bias",
        })
    for s in range(cfg.num_stages):
        for b in range(cfg.depths[s]):
            t = f"stages.{s}.{b}"
            blk = {
                "dwconv": _conv(sd, f"{t}.dwconv"),
                "norm": _ln(sd, f"{t}.norm"),
                "pwconv1": _dense(sd, f"{t}.pwconv1"),
                "pwconv2": _dense(sd, f"{t}.pwconv2"),
                "grn": {
                    "gamma": _np(sd[f"{t}.grn.gamma"]).reshape(-1),
                    "beta": _np(sd[f"{t}.grn.beta"]).reshape(-1),
                },
            }
            p[f"stage{s}_block{b}"] = blk
            consumed.update({
                f"{t}.dwconv.weight", f"{t}.dwconv.bias",
                f"{t}.norm.weight", f"{t}.norm.bias",
                f"{t}.pwconv1.weight", f"{t}.pwconv1.bias",
                f"{t}.pwconv2.weight", f"{t}.pwconv2.bias",
                f"{t}.grn.gamma", f"{t}.grn.beta",
            })
    unconsumed = {k: v for k, v in sd.items() if k not in consumed}
    return {"params": p}, unconsumed
