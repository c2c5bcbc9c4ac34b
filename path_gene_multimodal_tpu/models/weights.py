"""torch→Flax weight conversion.

The reference consumes published torch checkpoints (OpenAI CLIP /
Virchow2 via Mussel, ``pannuke_convnextv2_tiny_3`` via HoverNeXt,
``resnet34-idars-*`` via TIAToolbox). This module converts those
state_dicts into our Flax parameter trees so the TPU build loads the *same
weights* and meets the ≥0.999 embedding-cosine parity bar (BASELINE.md).

Supported CLIP naming schemes:
- HuggingFace ``transformers`` ``CLIPModel`` (``vision_model.encoder.layers.N...``)
- OpenAI original (``visual.transformer.resblocks.N...`` with fused
  ``in_proj_weight``)

Conversion rules: torch Conv (O, I, kh, kw) → flax (kh, kw, I, O);
torch Linear (O, I) → flax kernel (I, O); LayerNorm weight/bias →
scale/bias; Embedding stays (V, D).
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np

from path_gene_multimodal_tpu.models.clip import TextConfig, VisionConfig
from path_gene_multimodal_tpu.utils.log import get_logger


def _np(t) -> np.ndarray:
    """torch tensor / array → numpy float32."""
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if hasattr(t, "float"):
            # numpy has no bfloat16: modern bf16 checkpoints would raise
            # 'Got unsupported ScalarType BFloat16' without the upcast
            t = t.float()
        t = t.numpy()
    return np.asarray(t, dtype=np.float32)


def load_torch_checkpoint(
    path: str | Path, allow_pickle: bool = False
) -> dict[str, np.ndarray]:
    """Load a torch checkpoint safely.

    Published checkpoints (pannuke ConvNeXtV2, TIAToolbox ResNet34, CLIP)
    are untrusted downloads: unpickling arbitrary objects is code
    execution, so we load with ``weights_only=True`` (plain state_dicts
    load fine). Pass ``allow_pickle=True`` only for checkpoints you trust —
    it falls back to a full unpickle with a loud warning.
    """
    import torch

    try:
        sd = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise
        import warnings

        warnings.warn(
            f"{path}: weights_only load failed; falling back to full "
            "unpickling (allow_pickle=True). Only do this for trusted files "
            "— unpickling can execute arbitrary code.",
            stacklevel=2,
        )
        sd = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: _np(v) for k, v in sd.items() if hasattr(v, "shape")}


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _hf_block(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {
        "ln1": _ln(sd, f"{prefix}.layer_norm1"),
        "ln2": _ln(sd, f"{prefix}.layer_norm2"),
        "attn": {
            "q_proj": _linear(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{prefix}.self_attn.out_proj"),
        },
        "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
        "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
    }


def _openai_block(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    w = _np(sd[f"{prefix}.attn.in_proj_weight"])  # (3d, d)
    b = _np(sd[f"{prefix}.attn.in_proj_bias"])
    d = w.shape[1]
    qw, kw, vw = w[:d], w[d : 2 * d], w[2 * d :]
    qb, kb, vb = b[:d], b[d : 2 * d], b[2 * d :]
    return {
        "ln1": _ln(sd, f"{prefix}.ln_1"),
        "ln2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {
            "q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": _linear(sd, f"{prefix}.attn.out_proj"),
        },
        "fc1": _linear(sd, f"{prefix}.mlp.c_fc"),
        "fc2": _linear(sd, f"{prefix}.mlp.c_proj"),
    }


def convert_clip_vision(sd: Mapping[str, np.ndarray], cfg: VisionConfig) -> dict:
    """CLIP vision-tower state_dict → ``VisionTower`` params (``{"params": ...}``)."""
    hf = any(k.startswith("vision_model.") for k in sd)
    p: dict = {}
    if hf:
        p["patch_embed"] = {
            "kernel": _np(sd["vision_model.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
        }
        p["cls_token"] = _np(sd["vision_model.embeddings.class_embedding"]).reshape(-1)
        p["pos_embed"] = _np(sd["vision_model.embeddings.position_embedding.weight"])
        p["ln_pre"] = _ln(sd, "vision_model.pre_layrnorm")
        p["transformer"] = {
            f"block{i}": _hf_block(sd, f"vision_model.encoder.layers.{i}")
            for i in range(cfg.layers)
        }
        p["ln_post"] = _ln(sd, "vision_model.post_layernorm")
        if cfg.out_dim is not None and "visual_projection.weight" in sd:
            p["proj"] = {"kernel": _np(sd["visual_projection.weight"]).T}
    else:
        p["patch_embed"] = {
            "kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)
        }
        p["cls_token"] = _np(sd["visual.class_embedding"]).reshape(-1)
        p["pos_embed"] = _np(sd["visual.positional_embedding"])
        p["ln_pre"] = _ln(sd, "visual.ln_pre")
        p["transformer"] = {
            f"block{i}": _openai_block(sd, f"visual.transformer.resblocks.{i}")
            for i in range(cfg.layers)
        }
        p["ln_post"] = _ln(sd, "visual.ln_post")
        if cfg.out_dim is not None and "visual.proj" in sd:
            p["proj"] = {"kernel": _np(sd["visual.proj"])}  # already (width, out)
    return {"params": p}


def convert_clip_text(sd: Mapping[str, np.ndarray], cfg: TextConfig) -> dict:
    hf = any(k.startswith("text_model.") for k in sd)
    p: dict = {}
    if hf:
        p["token_embed"] = {"embedding": _np(sd["text_model.embeddings.token_embedding.weight"])}
        p["pos_embed"] = _np(sd["text_model.embeddings.position_embedding.weight"])
        p["transformer"] = {
            f"block{i}": _hf_block(sd, f"text_model.encoder.layers.{i}")
            for i in range(cfg.layers)
        }
        p["ln_final"] = _ln(sd, "text_model.final_layer_norm")
        p["proj"] = {"kernel": _np(sd["text_projection.weight"]).T}
    else:
        p["token_embed"] = {"embedding": _np(sd["token_embedding.weight"])}
        p["pos_embed"] = _np(sd["positional_embedding"])
        p["transformer"] = {
            f"block{i}": _openai_block(sd, f"transformer.resblocks.{i}")
            for i in range(cfg.layers)
        }
        p["ln_final"] = _ln(sd, "ln_final")
        p["proj"] = {"kernel": _np(sd["text_projection"])}  # (width, out)
    return {"params": p}


def infer_text_config(sd: Mapping[str, np.ndarray]) -> TextConfig:
    """Derive a TextConfig from a CLIP checkpoint's shapes."""
    hf = any(k.startswith("text_model.") for k in sd)
    if hf:
        vocab, width = sd["text_model.embeddings.token_embedding.weight"].shape
        ctx = sd["text_model.embeddings.position_embedding.weight"].shape[0]
        layers = (
            max(int(k.split(".")[3]) for k in sd if k.startswith("text_model.encoder.layers."))
            + 1
        )
        out_dim = int(sd["text_projection.weight"].shape[0])
    else:
        vocab, width = sd["token_embedding.weight"].shape
        ctx = sd["positional_embedding"].shape[0]
        layers = (
            max(int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks."))
            + 1
        )
        out_dim = int(sd["text_projection"].shape[1])
    fc1_key = (
        "text_model.encoder.layers.0.mlp.fc1.weight"
        if hf
        else "transformer.resblocks.0.mlp.c_fc.weight"
    )
    ratio = float(sd[fc1_key].shape[0]) / float(width)
    return TextConfig(
        vocab_size=int(vocab), context_length=int(ctx), width=int(width),
        layers=layers, heads=max(int(width) // 64, 1), mlp_ratio=ratio,
        out_dim=out_dim,
    )


def is_timm_vit_layout(sd: Mapping[str, np.ndarray]) -> bool:
    """True for timm VisionTransformer naming (the real Virchow2 layout:
    ``blocks.N.attn.qkv`` + ``patch_embed.proj``)."""
    return "patch_embed.proj.weight" in sd and any(
        k.startswith("blocks.0.attn.qkv.") for k in sd
    )


def infer_timm_vit_config(sd: Mapping[str, np.ndarray]):
    """TimmViTConfig from a timm ViT checkpoint's shapes (Virchow2:
    ViT-H/14, 4 registers, SwiGLU 5.3375, LayerScale)."""
    from path_gene_multimodal_tpu.models.vit_timm import (
        _HEADS_BY_WIDTH,
        TimmViTConfig,
    )

    conv = sd["patch_embed.proj.weight"]
    width, _, patch, _ = conv.shape
    layers = max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    ) + 1
    regs = int(sd["reg_token"].shape[1]) if "reg_token" in sd else 0
    n_pos = int(sd["pos_embed"].shape[-2])
    g = int(round(n_pos ** 0.5))
    if g * g == n_pos:
        mode, grid = "patches_only", g
    else:
        g = int(round((n_pos - 1 - regs) ** 0.5))
        if g * g != n_pos - 1 - regs:
            raise ValueError(f"cannot infer grid from pos_embed length {n_pos}")
        mode, grid = "prefix", g
    fc1_out = int(sd["blocks.0.mlp.fc1.weight"].shape[0])
    fc2_in = int(sd["blocks.0.mlp.fc2.weight"].shape[1])
    if fc1_out == 2 * fc2_in:
        mlp_type = "swiglu"
    elif fc1_out == fc2_in:
        mlp_type = "gelu"
    else:
        raise ValueError(f"unrecognized MLP shapes fc1={fc1_out}, fc2_in={fc2_in}")
    if int(width) not in _HEADS_BY_WIDTH:
        # heads is the one hyperparameter a state dict's shapes cannot
        # determine (qkv fuses all heads into one matrix). The width//64
        # convention holds for every published timm ViT we know of, but a
        # wrong guess silently corrupts attention math — make it loud and
        # overridable (pass an explicit TimmViTConfig to convert_timm_vit).
        get_logger().warning(
            "infer_timm_vit_config: width %d not in the known-heads table "
            "%s; ASSUMING heads=%d (width//64). If the checkpoint uses a "
            "different head count, pass an explicit TimmViTConfig(heads=...) "
            "to convert_timm_vit.",
            int(width), sorted(_HEADS_BY_WIDTH), max(int(width) // 64, 1),
        )
    return TimmViTConfig(
        image_size=grid * int(patch),
        patch_size=int(patch),
        width=int(width),
        layers=layers,
        heads=_HEADS_BY_WIDTH.get(int(width), max(int(width) // 64, 1)),
        num_registers=regs,
        mlp_hidden=fc1_out,
        mlp_type=mlp_type,
        use_layerscale="blocks.0.ls1.gamma" in sd,
        pos_embed_mode=mode,
    )


def convert_timm_vit(
    sd: Mapping[str, np.ndarray], cfg=None
) -> tuple[object, dict, dict]:
    """timm ViT (Virchow2) state dict → (TimmViTConfig, {"params": ...},
    unconsumed). Zero unconsumed keys on a clean checkpoint; ``head.*`` of
    num_classes=0 exports is absent by construction."""
    for prefix in ("module.", "model."):
        if any(k.startswith(prefix + "patch_embed.") for k in sd):
            sd = {
                k[len(prefix):] if k.startswith(prefix) else k: v
                for k, v in sd.items()
            }
    if cfg is None:
        cfg = infer_timm_vit_config(sd)
    else:
        # the checkpoint's pos_embed length is ground truth for
        # no_embed_class: a hand-picked cfg (e.g. the VIRCHOW2_TIMM
        # constant) must not crash the reshape — or silently build a
        # model whose prefix tokens are (un)posed differently from the
        # published network — when the real export disagrees
        import dataclasses

        n_pos = int(np.asarray(sd["pos_embed"]).shape[-2])
        if n_pos != cfg.pos_len:
            grid2 = cfg.grid * cfg.grid
            if n_pos == grid2:
                mode = "patches_only"
            elif n_pos == grid2 + 1 + cfg.num_registers:
                mode = "prefix"
            else:
                raise ValueError(
                    f"pos_embed has {n_pos} positions; config expects "
                    f"{cfg.pos_len} (grid {cfg.grid}², registers "
                    f"{cfg.num_registers}) — architecture mismatch"
                )
            get_logger().warning(
                "checkpoint pos_embed covers %d positions — overriding "
                "pos_embed_mode=%r (config said %r)",
                n_pos, mode, cfg.pos_embed_mode,
            )
            cfg = dataclasses.replace(cfg, pos_embed_mode=mode)
    consumed: set[str] = set()

    def take(key: str) -> np.ndarray:
        consumed.add(key)
        return _np(sd[key])

    def lin(prefix: str) -> dict:
        out = {"kernel": take(f"{prefix}.weight").T}
        if f"{prefix}.bias" in sd:
            out["bias"] = take(f"{prefix}.bias")
        return out

    def ln(prefix: str) -> dict:
        return {"scale": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    p: dict = {
        "patch_embed": {
            "kernel": take("patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": take("patch_embed.proj.bias"),
        },
        "cls_token": take("cls_token").reshape(-1),
        "pos_embed": take("pos_embed").reshape(cfg.pos_len, cfg.width),
        "norm": ln("norm"),
    }
    if cfg.num_registers:
        p["reg_token"] = take("reg_token").reshape(cfg.num_registers, cfg.width)
    for i in range(cfg.layers):
        t = f"blocks.{i}"
        blk = {
            "norm1": ln(f"{t}.norm1"),
            "attn": {"qkv": lin(f"{t}.attn.qkv"), "proj": lin(f"{t}.attn.proj")},
            "norm2": ln(f"{t}.norm2"),
            "mlp": {"fc1": lin(f"{t}.mlp.fc1"), "fc2": lin(f"{t}.mlp.fc2")},
        }
        if cfg.use_layerscale:
            blk["ls1"] = {"gamma": take(f"{t}.ls1.gamma")}
            blk["ls2"] = {"gamma": take(f"{t}.ls2.gamma")}
        p[f"block{i}"] = blk
    unconsumed = {k: v for k, v in sd.items() if k not in consumed}
    return cfg, {"params": p}, unconsumed


def infer_vision_config(sd: Mapping[str, np.ndarray]) -> VisionConfig:
    """Derive a VisionConfig from a CLIP checkpoint's shapes."""
    hf = any(k.startswith("vision_model.") for k in sd)
    if hf:
        conv = sd["vision_model.embeddings.patch_embedding.weight"]
        width, _, patch, _ = conv.shape
        n_pos = sd["vision_model.embeddings.position_embedding.weight"].shape[0]
        layers = (
            max(
                int(k.split(".")[3])
                for k in sd
                if k.startswith("vision_model.encoder.layers.")
            )
            + 1
        )
        out_dim = (
            int(sd["visual_projection.weight"].shape[0])
            if "visual_projection.weight" in sd
            else None
        )
    else:
        conv = sd["visual.conv1.weight"]
        width, _, patch, _ = conv.shape
        n_pos = sd["visual.positional_embedding"].shape[0]
        layers = (
            max(
                int(k.split(".")[3])
                for k in sd
                if k.startswith("visual.transformer.resblocks.")
            )
            + 1
        )
        out_dim = int(sd["visual.proj"].shape[1]) if "visual.proj" in sd else None
    fc1_key = (
        "vision_model.encoder.layers.0.mlp.fc1.weight"
        if hf
        else "visual.transformer.resblocks.0.mlp.c_fc.weight"
    )
    ratio = float(sd[fc1_key].shape[0]) / float(width)
    grid = int(round((n_pos - 1) ** 0.5))
    head_dim = 64
    return VisionConfig(
        image_size=grid * int(patch),
        patch_size=int(patch),
        width=int(width),
        layers=layers,
        heads=int(width) // head_dim,
        mlp_ratio=ratio,
        out_dim=out_dim,
    )
