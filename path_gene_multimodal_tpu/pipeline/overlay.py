"""Step 8/8 — thumbnail overlays of class polygons.

Host-side visualization, parity with the reference
(``create_and_overlay_polygon_from_prediction.py:429-634``): load a slide
thumbnail, scale polygon geometry from level-0 px into thumbnail px (affine
scale about the origin, ``scale_geometry_to_thumb`` ``:453-461``), draw all
classes on one figure with the 10-color palette + legend
(``plot_overlays_all_classes`` ``:475-560``) and one figure per class
(``plot_overlays_per_class`` ``:566-634``), 200 dpi PNGs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping, Sequence

import numpy as np

from path_gene_multimodal_tpu.core.artifacts import sanitize_for_filename
from path_gene_multimodal_tpu.io.slide import SlideReader

# 10-color palette (reference :507-510 uses matplotlib tab10)
PALETTE = (
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
)


def load_thumbnail_with_scale(
    slide: SlideReader, thumb_size: tuple[int, int] = (2000, 2000)
) -> tuple[np.ndarray, float, float]:
    """Thumbnail + per-axis scale factors thumb_px / level0_px
    (``load_svs_thumbnail`` :429-449)."""
    thumb = slide.get_thumbnail(thumb_size)
    w0, h0 = slide.level_dimensions[0]
    return thumb, thumb.shape[1] / w0, thumb.shape[0] / h0


def scale_ring_to_thumb(ring: np.ndarray, sx: float, sy: float) -> np.ndarray:
    """Affine scale about the origin (``scale_geometry_to_thumb`` :453-461)."""
    out = np.asarray(ring, np.float64).copy()
    out[:, 0] *= sx
    out[:, 1] *= sy
    return out


def plot_overlays_all_classes(
    thumb: np.ndarray,
    features: Sequence[Mapping[str, Any]],
    classes: Sequence[str],
    sx: float,
    sy: float,
    out_path: str | Path,
    dpi: int = 200,
    linewidth: float = 1.2,
    alpha: float = 0.35,
) -> Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Patch

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(12, 12))
    ax.imshow(thumb)
    color_of = {c: PALETTE[i % len(PALETTE)] for i, c in enumerate(classes)}
    present: set[str] = set()
    for f in features:
        c = f["class_name"]
        ring = scale_ring_to_thumb(f["exterior"], sx, sy)
        ax.fill(ring[:, 0], ring[:, 1], color=color_of.get(c, "#000000"),
                alpha=alpha, lw=0)
        ax.plot(ring[:, 0], ring[:, 1], color=color_of.get(c, "#000000"),
                lw=linewidth)
        present.add(c)
    handles = [Patch(color=color_of[c], label=c) for c in classes if c in present]
    if handles:
        ax.legend(handles=handles, loc="lower right", fontsize=7, framealpha=0.8)
    ax.set_axis_off()
    out_path = Path(out_path)
    fig.savefig(out_path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_overlays_per_class(
    thumb: np.ndarray,
    features: Sequence[Mapping[str, Any]],
    classes: Sequence[str],
    sx: float,
    sy: float,
    out_dir: str | Path,
    stem: str,
    dpi: int = 200,
) -> dict[str, Path]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    by_class: dict[str, list] = {}
    for f in features:
        by_class.setdefault(f["class_name"], []).append(f)
    outputs: dict[str, Path] = {}
    used_names: set[str] = set()
    for i, c in enumerate(classes):
        feats = by_class.get(c)
        if not feats:
            continue
        fig, ax = plt.subplots(figsize=(10, 10))
        ax.imshow(thumb)
        color = PALETTE[i % len(PALETTE)]
        for f in feats:
            ring = scale_ring_to_thumb(f["exterior"], sx, sy)
            ax.fill(ring[:, 0], ring[:, 1], color=color, alpha=0.4, lw=0)
            ax.plot(ring[:, 0], ring[:, 1], color=color, lw=1.0)
        ax.set_title(c, fontsize=9)
        ax.set_axis_off()
        name = sanitize_for_filename(c)
        if name in used_names:
            # two classes sanitizing to the same token ("tumor/stroma" vs
            # "tumor stroma") must not overwrite each other's PNG
            name = f"{name}_{i}"
        used_names.add(name)
        # reference contract: per-class overlays are `<class>.png` in the
        # per-slide dir (create_and_overlay_polygon_from_prediction.py:621-622)
        path = out_dir / f"{name}.png"
        fig.savefig(path, dpi=dpi, bbox_inches="tight")
        plt.close(fig)
        outputs[c] = path
    return outputs


def run_overlays(
    slide: SlideReader,
    features: Sequence[Mapping[str, Any]],
    classes: Sequence[str],
    out_dir: str | Path,
    stem: str,
    thumb_size: tuple[int, int] = (2000, 2000),
) -> dict[str, Any]:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)  # not the callers' job
    thumb, sx, sy = load_thumbnail_with_scale(slide, thumb_size)
    # reference contract: `<slide>_all_classes_overlay.png`
    # (create_and_overlay_polygon_from_prediction.py:497)
    all_path = plot_overlays_all_classes(
        thumb, features, classes, sx, sy,
        out_dir / f"{stem}_all_classes_overlay.png",
    )
    per_class = plot_overlays_per_class(thumb, features, classes, sx, sy, out_dir, stem)
    return {"overlay_all_path": all_path, "per_class_outputs": per_class}
