"""torch HoverNeXt checkpoint → Flax ``models.hovernext.HoverNeXt``.

Completes the pretrained-weight path for the nuclei model the reference
drives through the HoverNeXt repo (``/root/reference/hovernet_inference.py:82-131``,
checkpoint ``pannuke_convnextv2_tiny_3``): the ConvNeXtV2 encoder converts
via ``weights_convnext`` (official FCMAE naming), and this module maps the
U-Net decoder + NP/HV/TP heads so a layout-matching state dict drops in
with ZERO unconsumed keys.

Expected torch naming (the canonical drop-in layout, parity-tested against
a torch mirror in ``tests/test_hovernext_parity.py``):

- ``encoder.*``               — FCMAE ConvNeXtV2 (``downsample_layers`` / ``stages``)
- ``decoder.I.convJ|normJ.*`` — per decoder level I: two 3×3 convs with
  channels-last LayerNorms (J ∈ {0, 1})
- ``final_conv.*``            — 3×3 conv after the last 2× upsample
- ``head_np|head_hv|head_tp.*`` — 1×1 output heads

Checkpoints published with other namings should be re-keyed to this layout
(a mechanical rename); ``convert_hovernext`` returns the unconsumed keys so
mismatches are loud, and ``core.checkpoints.load_hovernext_from_torch``
raises on leftovers by default.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig
from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig
from path_gene_multimodal_tpu.models.weights_convnext import (
    convert_convnextv2,
    infer_convnext_config,
)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd: Mapping, key: str, consumed: set[str]) -> dict:
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    consumed.add(f"{key}.weight")
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
        consumed.add(f"{key}.bias")
    return out


def _ln(sd: Mapping, key: str, consumed: set[str]) -> dict:
    consumed.update({f"{key}.weight", f"{key}.bias"})
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def infer_hovernext_config(
    sd: Mapping[str, np.ndarray], input_size: int = 256
) -> HoverNeXtConfig:
    """Derive a HoverNeXtConfig from a layout-matching state dict's shapes."""
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    if not enc_sd:
        raise ValueError("no 'encoder.*' keys in state dict")
    enc = infer_convnext_config(enc_sd)
    dims = []
    i = 0
    while f"decoder.{i}.conv0.weight" in sd:
        dims.append(int(np.shape(sd[f"decoder.{i}.conv0.weight"])[0]))
        i += 1
    if not dims:
        raise ValueError("no 'decoder.I.conv0.*' keys in state dict")
    if len(dims) != enc.num_stages:
        raise ValueError(
            f"decoder has {len(dims)} levels but encoder has {enc.num_stages} stages"
        )
    if "head_tp.weight" not in sd:
        raise ValueError("missing 'head_tp.weight'")
    num_types = int(np.shape(sd["head_tp.weight"])[0]) - 1
    return HoverNeXtConfig(
        encoder=enc,
        decoder_dims=tuple(dims),
        num_types=num_types,
        input_size=input_size,
    )


def convert_hovernext(
    sd: Mapping[str, np.ndarray], cfg: HoverNeXtConfig | None = None
) -> tuple[HoverNeXtConfig, dict, dict]:
    """Full HoverNeXt state dict → (cfg, {"params": ...}, unconsumed_keys)."""
    for prefix in ("module.", "model."):
        if any(k.startswith(prefix + "encoder.") for k in sd):
            sd = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}
    if cfg is None:
        cfg = infer_hovernext_config(sd)

    enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    enc_vars, enc_left = convert_convnextv2(enc_sd, cfg.encoder)
    consumed: set[str] = {
        f"encoder.{k}" for k in enc_sd if k not in enc_left
    }

    p: dict = {"encoder": enc_vars["params"]}
    for i in range(len(cfg.decoder_dims)):
        p[f"dec{i}"] = {
            "conv0": _conv(sd, f"decoder.{i}.conv0", consumed),
            "norm0": _ln(sd, f"decoder.{i}.norm0", consumed),
            "conv1": _conv(sd, f"decoder.{i}.conv1", consumed),
            "norm1": _ln(sd, f"decoder.{i}.norm1", consumed),
        }
    p["final_conv"] = _conv(sd, "final_conv", consumed)
    p["head_np"] = _conv(sd, "head_np", consumed)
    p["head_hv"] = _conv(sd, "head_hv", consumed)
    p["head_tp"] = _conv(sd, "head_tp", consumed)

    unconsumed = {k: v for k, v in sd.items() if k not in consumed}
    return cfg, {"params": p}, unconsumed
