"""Model checkpoint persistence (orbax) + torch-checkpoint ingestion.

The reference only ever *consumes* external torch checkpoints
(``pannuke_convnextv2_tiny_3``, ``resnet34-idars-*``, CLIP — SURVEY.md §5
checkpoint/resume). This module owns both directions for the TPU build:

- ``save_params`` / ``load_params``: orbax-backed pytree checkpoints for
  our Flax params (fine-tuned probes, fusion heads, converted weights),
  with a numpy ``.npz`` fallback when orbax is unavailable;
- ``load_clip_from_torch`` / ``load_resnet_from_torch``: one-call
  ingestion of published torch checkpoints via the converters in
  ``models.weights`` / ``models.weights_resnet``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def _flat_key(kp) -> str:
    """Keypath → 'a/b/0/c' flat key (one definition; save/load must agree).

    Note: a param name containing '/' would corrupt the _unflatten
    round-trip, so reject it loudly here rather than silently mis-nest.
    """
    parts = [str(getattr(k, "key", getattr(k, "idx", k))) for k in kp]
    for p in parts:
        if "/" in p:
            raise ValueError(f"param tree key {p!r} contains '/'; cannot flatten")
    return "/".join(parts)


def _npz_path(path: Path) -> Path:
    """Append '.npz' without Path.with_suffix, which would truncate dotted
    stems (e.g. TCGA slide names containing '.')."""
    if path.name.endswith(".npz"):
        return path
    return path.parent / (path.name + ".npz")


def file_fingerprint(path: str | Path, sample: int = 1 << 20) -> str:
    """Cheap content fingerprint of a weights artifact for resume
    manifests: sha1 over (size, first ``sample`` bytes, last ``sample``
    bytes) — content-sensitive without reading multi-GB files whole."""
    import hashlib

    p = Path(path)
    size = p.stat().st_size
    h = hashlib.sha1(str(size).encode())
    with open(p, "rb") as f:
        h.update(f.read(sample))
        if size > sample:
            f.seek(max(size - sample, 0))
            h.update(f.read(sample))
    return h.hexdigest()[:16]


def text_sidecar_path(artifact: str | Path) -> Path:
    """``<artifact minus a literal .npz>_text.npz`` — where the CLIP text
    tower rides along a converted vision artifact. One definition so the
    convert-weights writer and every reader agree (and dotted stems like
    ``clip.v2`` survive; Path.with_suffix would truncate them)."""
    p = Path(artifact)
    name = p.name
    if name.endswith(".npz"):
        name = name[: -len(".npz")]
    return p.parent / f"{name}_text.npz"


def save_params(params: Any, path: str | Path) -> Path:
    path = Path(path)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        ocp = None
    if ocp is not None:
        try:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path.resolve(), jax.device_get(params), force=True)
            ckptr.wait_until_finished()
            return path
        except Exception:
            # a REAL save failure (disk full, serialization error) must not
            # silently degrade to npz: a partial orbax dir left at `path`
            # would shadow the npz on a later load. Clean it and re-raise.
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            raise
    # orbax absent → flat-npz fallback
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[_flat_key(kp)] = np.asarray(leaf)
    out = _npz_path(path)
    np.savez_compressed(out, **flat)
    return out


def load_params(path: str | Path, like: Any | None = None) -> Any:
    path = Path(path)
    is_npz = path.name.endswith(".npz")
    if is_npz or (not path.exists() and _npz_path(path).exists()):
        npz_path = path if is_npz else _npz_path(path)
        with np.load(npz_path) as z:
            flat = {k: z[k] for k in z.files}
        if like is None:
            return _unflatten(flat)
        leaves_with_paths = jax.tree_util.tree_flatten_with_path(like)[0]
        treedef = jax.tree_util.tree_structure(like)
        leaves = []
        for kp, _ in leaves_with_paths:
            leaves.append(flat[_flat_key(kp)])
        return jax.tree_util.tree_unflatten(treedef, leaves)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), like
        )
        return ckptr.restore(path.resolve(), abstract)
    return ckptr.restore(path.resolve())


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    out: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


# ---------------------------------------------------------------------------
# torch checkpoint ingestion
# ---------------------------------------------------------------------------


def load_clip_from_torch(path: str | Path, allow_pickle: bool = False):
    """torch CLIP checkpoint → (vision_cfg, vision_params, text_cfg|None,
    text_params|None). Accepts transformers CLIPModel or OpenAI naming.

    ``allow_pickle`` (all loaders): permit the full-unpickle fallback for
    trusted checkpoints that ``weights_only=True`` cannot read (pre-2.6
    torch files with pickled wrapper objects) — see
    ``models.weights.load_torch_checkpoint``."""
    from path_gene_multimodal_tpu.models.weights import (
        convert_clip_text,
        convert_clip_vision,
        infer_text_config,
        infer_vision_config,
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(path, allow_pickle=allow_pickle)
    vcfg = infer_vision_config(sd)
    vparams = convert_clip_vision(sd, vcfg)
    has_text = any(
        k.startswith(("text_model.", "transformer.resblocks.", "token_embedding"))
        for k in sd
    )
    if has_text:
        tcfg = infer_text_config(sd)
        tparams = convert_clip_text(sd, tcfg)
    else:
        tcfg = tparams = None
    return vcfg, vparams, tcfg, tparams


def load_virchow2_from_torch(
    path: str | Path, strict: bool = True, allow_pickle: bool = False
):
    """Published Virchow2 checkpoint (timm ViT-H/14 naming: ``cls_token``,
    ``reg_token``, ``blocks.N.attn.qkv``, SwiGLU ``mlp.fc1/fc2``,
    ``ls1/ls2.gamma``) → (TimmViTConfig, variables). Reference consumer:
    ``extract_embedding_from_tiles.py:14`` (``MODEL_TYPE="Virchow2"``).
    Use the returned config with ``models.clip.ImageEncoder`` (ImageNet
    mean/std) — the tile embedding is concat(cls, patch-mean), 2560-d."""
    from path_gene_multimodal_tpu.models.weights import (
        convert_timm_vit,
        load_torch_checkpoint,
    )

    sd = load_torch_checkpoint(path, allow_pickle=allow_pickle)
    cfg, variables, leftover = convert_timm_vit(sd)
    if leftover and strict:
        raise ValueError(
            f"{len(leftover)} checkpoint keys were not consumed by the timm "
            f"ViT mapping (first 10: {sorted(leftover)[:10]}); pass "
            "strict=False to get them back for manual wiring"
        )
    if not strict:
        return cfg, variables, leftover
    return cfg, variables


def load_convnext_encoder_from_torch(path: str | Path, allow_pickle: bool = False):
    """HoverNeXt/FCMAE-style torch checkpoint → (ConvNeXtConfig, encoder
    variables, unconsumed decoder/head keys). Decoder mapping is checkpoint-
    specific; the unconsumed dict lets callers wire it explicitly."""
    from path_gene_multimodal_tpu.models.weights import load_torch_checkpoint
    from path_gene_multimodal_tpu.models.weights_convnext import (
        convert_convnextv2,
        infer_convnext_config,
    )

    sd = load_torch_checkpoint(path, allow_pickle=allow_pickle)
    if any(k.startswith("stages.0.blocks.") for k in sd):
        # timm export naming — route to the timm converter (the hovernext
        # real-layout path already owns it) instead of refusing
        from path_gene_multimodal_tpu.models.weights_hovernext_real import (
            convert_convnextv2_timm,
            infer_convnext_config_timm,
        )

        cfg = infer_convnext_config_timm(sd)
        params, consumed = convert_convnextv2_timm(sd, cfg)
        leftover = {k: v for k, v in sd.items() if k not in consumed}
        return cfg, {"params": params}, leftover
    cfg = infer_convnext_config(sd)
    variables, leftover = convert_convnextv2(sd, cfg)
    return cfg, variables, leftover


def _is_real_hovernext_layout(sd) -> bool:
    """True for the published smp/timm ``hover_next`` layout (smp decoder
    blocks ``*.blocks.N.conv1.0.weight`` or a timm-universal encoder)."""
    import re

    pat = re.compile(r"\.blocks\.\d+\.conv1\.0\.weight$")
    return any(pat.search(k) for k in sd) or any(
        k.startswith(("encoder.model.stem.", "model.encoder.model.stem."))
        for k in sd
    )


def load_hovernext_from_torch(
    path: str | Path, strict: bool = True, allow_pickle: bool = False
):
    """Full pretrained HoverNeXt checkpoint → (config, variables).

    Auto-detects the layout family:

    - the published ``pannuke_convnextv2_tiny_3`` smp/timm layout
      (``hover_next`` multi-head U-Net; reference entry
      ``hovernet_inference.py:82-131``) → ``RealHoverNeXtConfig`` +
      ``models.hovernext_real.RealHoverNeXt`` params, via
      ``weights_hovernext_real.convert_real_hovernext``;
    - the canonical TPU-native layout (``decoder.I.convJ/normJ``,
      ``head_np|hv|tp``) → ``HoverNeXtConfig`` + ``models.hovernext``
      params, via ``weights_hovernext.convert_hovernext``.

    ``strict=True`` (default) raises if any checkpoint key is not consumed
    by the mapping, so a naming mismatch is loud rather than a silently
    half-loaded model. Set ``strict=False`` to get
    (cfg, variables, unconsumed) back for manual wiring.
    """
    from path_gene_multimodal_tpu.models.weights import load_torch_checkpoint

    sd = load_torch_checkpoint(path, allow_pickle=allow_pickle)
    if _is_real_hovernext_layout(sd):
        from path_gene_multimodal_tpu.models.weights_hovernext_real import (
            convert_real_hovernext,
        )

        cfg, variables, leftover = convert_real_hovernext(sd)
    else:
        from path_gene_multimodal_tpu.models.weights_hovernext import (
            convert_hovernext,
        )

        cfg, variables, leftover = convert_hovernext(sd)
    if leftover and strict:
        raise ValueError(
            f"{len(leftover)} checkpoint keys were not consumed by the "
            f"HoverNeXt mapping (first 10: {sorted(leftover)[:10]}); re-key "
            "the checkpoint to the documented layout or pass strict=False"
        )
    if not strict:
        return cfg, variables, leftover
    return cfg, variables


def load_resnet_from_torch(path: str | Path, allow_pickle: bool = False):
    """torchvision/TIAToolbox ResNet34 checkpoint → Flax variables."""
    from path_gene_multimodal_tpu.models.weights import load_torch_checkpoint
    from path_gene_multimodal_tpu.models.weights_resnet import convert_resnet34

    return convert_resnet34(load_torch_checkpoint(path, allow_pickle=allow_pickle))


# ---------------------------------------------------------------------------
# converted-checkpoint artifacts (torch-free reload)
# ---------------------------------------------------------------------------
# The torch→Flax conversion needs torch installed and costs real time on a
# big checkpoint; production TPU workers often have neither torch nor the
# original file. ``save_converted`` persists (kind, architecture config,
# params) as ONE .npz so conversion runs once (see cli/convert_weights.py)
# and every worker reloads with ``load_converted`` — no torch import.

_CONVERTED_KINDS = ("clip", "clip_text", "virchow2", "hovernext", "resnet34", "convnext")


def save_converted(kind: str, cfg: Any, variables: Any, path: str | Path) -> Path:
    """Persist a converted checkpoint: flattened params (``p:`` keys) plus a
    JSON meta record (``__meta__``: kind + dataclass config) in one npz."""
    import dataclasses
    import json

    if kind not in _CONVERTED_KINDS:
        raise ValueError(f"unknown converted-checkpoint kind {kind!r}")
    path = _npz_path(Path(path))
    flat: dict[str, np.ndarray] = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        flat["p:" + _flat_key(kp)] = np.asarray(leaf)
    meta = {
        "kind": kind,
        "config": dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else None,
    }
    flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)
    return path


def load_converted(path: str | Path) -> tuple[str, Any, Any]:
    """→ (kind, config, variables). The config class matches the kind
    (VisionConfig / TextConfig / TimmViTConfig / HoverNeXtConfig /
    RealHoverNeXtConfig / ConvNeXtConfig; None for resnet34)."""
    import json

    with np.load(Path(path)) as z:
        if "__meta__" not in z.files:
            raise ValueError(
                f"{path}: not a converted-checkpoint artifact (no __meta__); "
                "plain param trees load with load_params"
            )
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        flat = {k[2:]: z[k] for k in z.files if k.startswith("p:")}
    return meta["kind"], _config_from_meta(meta["kind"], meta["config"]), _unflatten(flat)


def _config_from_meta(kind: str, d: dict | None) -> Any:
    if d is None:
        return None
    if kind == "clip":
        from path_gene_multimodal_tpu.models.clip import VisionConfig

        return VisionConfig(**d)
    if kind == "clip_text":
        from path_gene_multimodal_tpu.models.clip import TextConfig

        return TextConfig(**d)
    if kind == "virchow2":
        from path_gene_multimodal_tpu.models.vit_timm import TimmViTConfig

        return TimmViTConfig(**d)
    if kind == "convnext":
        from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig

        return ConvNeXtConfig(depths=tuple(d["depths"]), dims=tuple(d["dims"]))
    if kind == "hovernext":
        from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig

        enc = ConvNeXtConfig(
            depths=tuple(d["encoder"]["depths"]), dims=tuple(d["encoder"]["dims"])
        )
        if "branches" in d:  # the published smp/timm multi-head layout
            from path_gene_multimodal_tpu.models.hovernext_real import (
                RealHoverNeXtConfig,
            )

            return RealHoverNeXtConfig(
                encoder=enc,
                decoder_channels=tuple(d["decoder_channels"]),
                branches=tuple((a, b, int(c)) for a, b, c in d["branches"]),
                head_upsampling=int(d["head_upsampling"]),
                input_size=int(d["input_size"]),
            )
        from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig

        return HoverNeXtConfig(
            encoder=enc,
            decoder_dims=tuple(d["decoder_dims"]),
            num_types=int(d["num_types"]),
            input_size=int(d["input_size"]),
        )
    raise ValueError(f"unknown converted-checkpoint kind {kind!r}")
