"""Central typed configuration tree.

Mirrors the reference's single-source-of-truth config module
(``/root/reference/tnbc_config.py:8-55``) — same parameter names, same
defaults — but as an immutable dataclass tree instead of module-level
globals, so configs can be constructed per-run, overridden from the CLI,
and hashed for step-granular resume manifests.

The reference's quirks that downstream geometry depends on are carried
explicitly (see ``CompatConfig``): e.g. the TME ROI is computed with
``patch_size=508`` boxes even though tiles are 224 px, because
``main.py:215-220`` never overrides ``load_annotations_with_coords``'s
default (``load_annotation_with_coordinates.py:21``).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

# The five TNBC tissue classes (reference tnbc_config.py:8-14).
DEFAULT_CLASSES: tuple[str, ...] = (
    "Invasive tumor epithelium (TNBC) or In situ carcinoma (DCIS / LCIS)",
    "Tumor-associated stroma",
    "Lymphocyte-rich stroma / TILs",
    "Lymphoid aggregate / TLS",
    "Necrosis / other non-viable tissue",
)

# Classes whose tiles seed the TME region of interest (tnbc_config.py:16-19).
DEFAULT_TME_CLASSES: tuple[str, ...] = DEFAULT_CLASSES[:2]

# Recognised pyramidal-slide extensions (tnbc_config.py:28).
WSI_EXTS: frozenset[str] = frozenset({".svs", ".tif", ".tiff", ".ndpi", ".mrxs"})

# HoverNeXt nucleus type ids → names (reference aggregated_hovernet_run.py:76-82).
TYPE_NAMES: dict[int, str] = {
    1: "neoplastic",
    2: "inflammatory",
    3: "connective",
    4: "dead",
    5: "epithelial",
}

# IDaRS molecular endpoints → pretrained-model tags
# (reference molecular_feature_extraction.py:21-28).
DEFAULT_MOLECULAR_TASKS: dict[str, str] = {
    "msi": "resnet34-idars-msi",
    "hm": "resnet34-idars-hm",
    "cin": "resnet34-idars-cin",
    "cimp": "resnet34-idars-cimp",
    "braf": "resnet34-idars-braf",
    "tp53": "resnet34-idars-tp53",
}


@dataclass(frozen=True)
class PolygonConfig:
    """Polygonization parameters (tnbc_config.py:47-51)."""

    smooth_radius_tiles: float = 1.0
    blur_sigma: float | None = None
    area_min_tiles: int = 3
    simplify_frac: float = 0.2
    min_polygon_area_px: float = 3 * 224 * 224
    # Overlap resolution mode: "prob" (argmax of per-class scores) or
    # "priority" (config class order wins) — reference
    # create_and_overlay_polygon_from_prediction.py:186-218.
    overlap_mode: str = "prob"


@dataclass(frozen=True)
class TessellationConfig:
    """Tissue segmentation + tiling (reference tiling.py:28-42). The tile
    size itself is the root ``PipelineConfig.patch_size``."""

    use_otsu: bool = True
    segment_threshold: int = 20
    thumbnail_size: int = 1024
    min_foreground_frac: float = 0.5
    write_patch_pngs: bool = False  # reference writes per-tile PNGs; optional here
    num_workers: int = 4


@dataclass(frozen=True)
class EmbeddingConfig:
    """Tile feature extraction (reference extract_embedding_from_tiles.py:48-57).
    The model choice is the root ``PipelineConfig.model_type``; the input
    size comes from the vision config."""

    # reference uses BATCH_SIZE=128; 512 is the measured v5e throughput
    # knee for ViT-B/16 bf16 (1493→2230 t/s going 128→512)
    batch_size: int = 512
    # the ViT-H Virchow2 tower measures 272 t/s at 64 on v5e but DEGRADES
    # to 205 at 128 (activation pressure) — its own knee, clamped in
    # pipeline/embed.py when model_type startswith "virchow". Tracked
    # every round as bench detail embed_virchow2_tiles_per_sec (r5: 271)
    virchow2_batch_size: int = 64
    dtype: str = "bfloat16"
    # ship JPEG tiles to the device as raw 4:2:0 planes (half the
    # host→device bytes; chroma upsample + color conversion finish on
    # device — ops/jpegcolor.py) whenever the slide supports it.
    # Decode-level note: planar-served chunks reconstruct chroma with
    # NEAREST (2×2) upsampling (bit-identical to libjpeg's merged path)
    # while fallback chunks (odd coords, non-4:2:0 tiles) use libjpeg's
    # default fancy upsampling — per-pixel deltas ≤16 at chroma edges,
    # comparable to the reference's own PIL-vs-cv2 decode variation.
    # Set False for a single-upsampler (fancy) run.
    planar_feed: bool = True


@dataclass(frozen=True)
class TMEConfig:
    """TME region-of-interest geometry (load_annotation_with_coordinates.py:188-222)."""

    # Reference quirk: ROI boxes use the *default* 508 px patch size, not the
    # actual 224 px tile size, because main.py:215-220 doesn't pass patch_size.
    roi_patch_size: int = 508
    buffer_factor: float = 2.0  # buffer = buffer_factor * roi_patch_size


@dataclass(frozen=True)
class HoverNeXtConfig:
    """Nuclei segmentation (reference hovernet_inference.py:188-206).
    ``tile_size`` is the model input/window size — CLI/model builders read
    it; ``max_instances_per_tile`` caps the per-window instance ids."""

    checkpoint: str = "pannuke_convnextv2_tiny_3"
    tile_size: int = 256
    overlap: float = 0.96875
    tta: int = 4
    # 128 is the measured throughput knee on v5e for the round-3 fused
    # pipeline (TTA×4 folded forward: 311→356 t/s going 64→128, flat at
    # 256; watershed postproc 936→1182 t/s); the reference uses 32
    batch_size: int = 128
    pp_tiling: int = 8
    pp_overlap: int = 256
    max_instances_per_tile: int = 512
    # ship JPEG tiles as raw 4:2:0 planes and finish decode on device
    # (half the host→device bytes; see ops/jpegcolor.py). Same nearest-
    # vs-fancy chroma note as EmbeddingConfig.planar_feed.
    planar_feed: bool = True


@dataclass(frozen=True)
class MolecularConfig:
    """IDaRS molecular predictors (reference molecular_feature_extraction.py:31-51)."""

    tasks: tuple[str, ...] = tuple(DEFAULT_MOLECULAR_TASKS)
    # reference uses 64; 256 is the measured v5e knee for the 6-model
    # vmapped sweep (882→1933 t/s isolated). Tracked every round as bench
    # detail molecular_tiles_per_sec (r5: 1575 on tissue tiles)
    batch_size: int = 256
    thumb_power: float = 4.0
    save_prob_maps: bool = False


@dataclass(frozen=True)
class GraphConfig:
    """Spatial cell graph (reference hovernet_tile_inference.ipynb cells 11, 23-27)."""

    knn_k: int = 5
    radius_um: float = 40.0
    mpp: float = 0.25


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / sharding configuration (TPU-native; no reference analog —
    the reference is single-GPU per LSF job)."""

    data_axis: str = "tiles"
    num_devices: int | None = None  # None → all local devices


@dataclass(frozen=True)
class CompatConfig:
    """Behavioral-compatibility switches for reference quirks (SURVEY.md §7)."""

    # png naming {x}_{y}.png (current) vs legacy {tile_index}.png
    # (postprocessing.py:107 vs load_annotation_with_coordinates.py:177-180).
    legacy_png_names: bool = False
    # tme_classes default = ALL classes (load_annotation_with_coordinates.py:195).
    tme_classes_default_all: bool = True
    # tiles_to_grid maps tiles by RANK of unique x/y (gaps collapse) —
    # create_and_overlay_polygon_from_prediction.py:111-124; False = dense
    # (x - x0) // tile mapping (geometrically correct for gappy grids).
    rank_compressed_grid: bool = True
    # TME margin corner metric: True = shapely's quad_segs=8 inscribed
    # polygon buffer (load_annotation_with_coordinates.py:216-222, exact
    # reference parity incl. the ≤0.48% corner inset); False = true
    # Euclidean disc.
    polygonal_buffer_corners: bool = True


@dataclass(frozen=True)
class PipelineConfig:
    """Root config — field names follow tnbc_config.py where one exists."""

    classes: tuple[str, ...] = DEFAULT_CLASSES
    tme_classes: tuple[str, ...] = DEFAULT_TME_CLASSES
    data_path: str = ""
    outroot: str = ""
    patch_size: int = 224
    model_type: str = "CLIP"
    batch_size: int = 128
    thumb_size: tuple[int, int] = (2000, 2000)
    done_flag_name: str = "_DONE.json"
    done_flag_molecular: str = "_DONE_MOLECULAR.json"
    stale_lock_hours: float = 48.0

    tessellation: TessellationConfig = field(default_factory=TessellationConfig)
    embedding: EmbeddingConfig = field(default_factory=EmbeddingConfig)
    tme: TMEConfig = field(default_factory=TMEConfig)
    polygon: PolygonConfig = field(default_factory=PolygonConfig)
    hovernext: HoverNeXtConfig = field(default_factory=HoverNeXtConfig)
    molecular: MolecularConfig = field(default_factory=MolecularConfig)
    graph: GraphConfig = field(default_factory=GraphConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    compat: CompatConfig = field(default_factory=CompatConfig)

    def replace(self, **kw: Any) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def content_hash(self) -> str:
        """Stable hash for step-granular resume manifests."""
        blob = json.dumps(self.to_dict(), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


def default_config(**overrides: Any) -> PipelineConfig:
    return PipelineConfig(**overrides)


def resolve_tile_png_name(x: int, y: int, tile_index: int, compat: CompatConfig) -> str:
    """Tile PNG naming contract: ``{x}_{y}.png`` (current) or
    ``{tile_index}.png`` (legacy) — load_annotation_with_coordinates.py:177-180."""
    if compat.legacy_png_names:
        return f"{tile_index}.png"
    return f"{x}_{y}.png"


def slide_paths(data_path: str | Path) -> list[Path]:
    """Recursive WSI scan (tnbc_config.py:31-34), as a function instead of an
    import side effect."""
    root = Path(data_path)
    if not root.exists():
        return []
    return sorted(
        p for p in root.rglob("*") if p.is_file() and p.suffix.lower() in WSI_EXTS
    )
