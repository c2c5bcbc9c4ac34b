"""Steps 2-4 of 8 — tile embeddings, class text embeddings, zero-shot
annotation.

TPU-native rebuild of the reference's Mussel wrappers:

- step 2 ``run_extract_features`` (ref ``extract_embedding_from_tiles.py:9-70``):
  decode tiles on the host (double-buffered against device compute), run the
  CLIP/Virchow2 image tower batched in bf16 under jit (optionally sharded
  over the mesh tile axis), write ``<slide>_features.h5`` + the
  reference's torch ``.pt`` sidecar + an ``.npy`` sidecar.
- step 3 ``run_create_class_embeddings`` (ref ``create_embedding.py:13-69``):
  tokenize the class prompts, run the text tower once, save
  ``<slide>_classes.npy`` + the reference's torch ``.pt``
  (create_embedding.py:65-66).
- step 4 ``run_annotation`` (ref ``find_annotation_from_embedding.py:9-72``):
  cosine similarity tile×class on device → per-class score columns +
  ``predicted_class`` argmax → ``<slide>_annotations.csv``.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from path_gene_multimodal_tpu.config import PipelineConfig
from path_gene_multimodal_tpu.core.artifacts import write_features_h5
from path_gene_multimodal_tpu.io.slide import SlideReader
from path_gene_multimodal_tpu.models.clip import ImageEncoder, TextEncoder
from path_gene_multimodal_tpu.ops.jpegcolor import (
    ycbcr420_to_rgb_jit as _planar_to_rgb,
)
from path_gene_multimodal_tpu.pipeline.tessellate import iter_tile_batches


def _is_virchow_tower(cfg: PipelineConfig, encoder) -> bool:
    """True when the ACTUAL image tower is the ViT-H Virchow2 — judged by the
    encoder's config, not only ``cfg.model_type``: a real Virchow2 artifact
    loaded via ``--weights`` runs with whatever model_type the config left in
    place, and it must still get the measured batch knee + correct artifact
    metadata."""
    if cfg.model_type.lower().startswith("virchow"):
        return True
    from path_gene_multimodal_tpu.models.vit_timm import TimmViTConfig

    return isinstance(getattr(encoder, "cfg", None), TimmViTConfig)


def _recorded_model_type(cfg: PipelineConfig, encoder) -> str:
    """model_type written into the features artifact — the actual tower."""
    if _is_virchow_tower(cfg, encoder) and not cfg.model_type.lower().startswith("virchow"):
        return "Virchow2"
    return cfg.model_type


def run_extract_features(
    slide: SlideReader,
    coords: np.ndarray,
    encoder: ImageEncoder,
    out_dir: str | Path,
    stem: str,
    cfg: PipelineConfig,
    write_artifacts: bool = True,
) -> np.ndarray:
    """Embed every tile; returns (N, D) float32. Host decode overlaps device
    compute: jax dispatch is async, so the Python loop decodes batch k+1
    while the TPU runs batch k. (Stage timing/items are the caller's
    concern — runner.py wraps this in ``timer.stage(...)``.)"""
    batch = cfg.embedding.batch_size
    if _is_virchow_tower(cfg, encoder):
        # the ViT-H Virchow2 tower has its own measured knee (see
        # EmbeddingConfig.virchow2_batch_size) — clamp to it
        batch = min(batch, cfg.embedding.virchow2_batch_size)
    mesh = getattr(encoder, "mesh", None)
    if mesh is not None:
        # sharded batches must divide the mesh — round the (possibly
        # clamped) batch down to a device multiple rather than crash the
        # device_put on the first batch
        m = mesh.devices.size
        batch = max((batch // m) * m, m)
    tile = cfg.patch_size
    # half-bandwidth planar feed: raw 4:2:0 planes over the link, chroma
    # upsample + color conversion on device (ops/jpegcolor.py). Disabled
    # under the mesh (same as nuclei): the plane→RGB conversion would run
    # on the default device and force a reshard hop.
    planar = (
        mesh is None
        and cfg.embedding.planar_feed
        and tile % 2 == 0
        and getattr(slide, "supports_planar", lambda level=0: False)()
        # odd-coord / non-4:2:0 chunks degrade to RGB payloads per chunk
        # inside iter_tile_batches (discriminated below by isinstance)
    )
    outs: list[jax.Array] = []
    valids: list[np.ndarray] = []
    for tiles_u8, valid in iter_tile_batches(
        slide, coords, tile, batch, planar=planar
    ):
        if planar and isinstance(tiles_u8, tuple):
            yb, cbcr = tiles_u8
            emb = encoder(_planar_to_rgb(jnp.asarray(yb), jnp.asarray(cbcr)))
        else:  # RGB payload (planar off, or a chunk that fell back).
            # Pass the host array straight through: the encoder places it
            # (sharded device_put scatters per shard; jnp.asarray here
            # would commit the full batch to device 0 first)
            emb = encoder(tiles_u8)  # async dispatch
        if hasattr(emb, "copy_to_host_async"):
            # enqueue the D2H copy behind this batch's compute: the final
            # np.concatenate then collects already-landed host buffers
            emb.copy_to_host_async()
        outs.append(emb)
        valids.append(valid)
    if not outs:
        # width must match what the encoder would have emitted (2560 for
        # Virchow2, 768 for ViT-L/14 …) so empty-slide artifacts keep the
        # same schema as populated ones
        feats = np.zeros((0, getattr(encoder, "out_dim", 512)), np.float32)
    else:
        feats = np.concatenate(
            [np.asarray(o)[v] for o, v in zip(outs, valids)], axis=0
        ).astype(np.float32)
    if write_artifacts:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        h5_path = out_dir / f"{stem}_features.h5"
        write_features_h5(h5_path, feats, model_type=_recorded_model_type(cfg, encoder))
        np.save(out_dir / f"{stem}_features.npy", feats)
        # reference writes the features h5 AND a torch .pt sidecar
        # (extract_embedding_from_tiles.py:70) — keep that contract for
        # downstream torch consumers
        try:
            import torch

            torch.save(torch.from_numpy(feats), out_dir / f"{stem}_features.pt")
        except ImportError:  # torch-less deploys keep the h5/npy pair
            pass
        if not h5_path.exists():  # output oracle (extract_embedding_from_tiles.py:61-62)
            raise RuntimeError(f"feature extraction failed to produce {h5_path}")
    return feats


def run_create_class_embeddings(
    class_names: list[str],
    text_encoder: TextEncoder,
    tokenizer,
    out_dir: str | Path,
    stem: str,
    prompt_template: str = "{}",
    write_artifacts: bool = True,
) -> np.ndarray:
    """One text embedding per class label (ref create_embedding.py:13-69).
    Returns (C, D) float32."""
    prompts = [prompt_template.format(c) for c in class_names]
    ids = tokenizer(prompts)
    embs = np.asarray(text_encoder(jnp.asarray(ids))).astype(np.float32)
    if write_artifacts:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        path = out_dir / f"{stem}_classes.npy"
        np.save(path, embs)
        # reference writes a torch .pt (create_embedding.py:65-66) — keep
        # that contract alongside the .npy
        try:
            import torch

            torch.save(torch.from_numpy(embs), out_dir / f"{stem}_classes.pt")
        except ImportError:
            pass
        if not path.exists():
            raise RuntimeError(f"class-embedding step failed to produce {path}")
    return embs


@jax.jit
def _cosine_scores(tile_embs: jnp.ndarray, class_embs: jnp.ndarray) -> jnp.ndarray:
    a = tile_embs / jnp.maximum(jnp.linalg.norm(tile_embs, axis=-1, keepdims=True), 1e-8)
    b = class_embs / jnp.maximum(jnp.linalg.norm(class_embs, axis=-1, keepdims=True), 1e-8)
    return jnp.matmul(a, b.T, preferred_element_type=jnp.float32)


def run_annotation(
    tile_features: np.ndarray,
    class_embeddings: np.ndarray,
    class_names: list[str],
    out_dir: str | Path,
    stem: str,
    write_artifacts: bool = True,
) -> pd.DataFrame:
    """Cosine-similarity zero-shot annotation (ref
    find_annotation_from_embedding.py:9-72): per-class score columns +
    ``predicted_class`` argmax. Returns the annotation frame indexed by
    ``tile_index``."""
    if len(tile_features) == 0:
        raise ValueError("no tile features to annotate (empty slide?)")
    scores = np.asarray(
        _cosine_scores(jnp.asarray(tile_features), jnp.asarray(class_embeddings))
    )
    df = pd.DataFrame(scores, columns=list(class_names))
    df.insert(0, "tile_index", np.arange(len(df), dtype=np.int64))
    df["predicted_class"] = [class_names[i] for i in scores.argmax(axis=1)]
    if write_artifacts:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        path = out_dir / f"{stem}_annotations.csv"
        df.to_csv(path, index=False)
        if not path.exists():
            raise RuntimeError(f"annotation step failed to produce {path}")
    return df
