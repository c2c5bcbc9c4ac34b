"""Tissue/tumor boundary morphology + island analytics.

TPU-native rebuild of ``polygon_morphology.py`` (SURVEY.md §2 C15) and the
burden-metrics script ``untitled.py``:

- ``tissue_boundary_mask``: HSV saturation > 0.04 → disk(6) closing →
  remove small objects/holes (5000 px) — all on device
  (``polygon_morphology.py:100-153``);
- ``mask_to_thumb_polygons``: labeled components → marching-squares
  boundary polygons in thumbnail space;
- ``island_table_one_slide_level0``: one row per tumor/TIL/TLS island with
  area/perimeter/centroid/bbox + tissue area (``:214-263`` — exact column
  set);
- ``process_one_slide_make_csv_and_plot`` → ``<stem>_islands.csv`` +
  ``<stem>_boundaries.png`` (``:267-359``);
- ``write_basic_size_burden_metrics_txt``: the append-only per-slide TXT
  metric block (tumor/TIL/TLS areas, fractions, immune dominance index —
  ``untitled.py:45-112``, same layout).
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from path_gene_multimodal_tpu.core.artifacts import (
    load_geojson,
    polygon_ring_area_perimeter,
)
from path_gene_multimodal_tpu.io.slide import SlideReader
from path_gene_multimodal_tpu.ops import components as cc
from path_gene_multimodal_tpu.ops import contours as ct
from path_gene_multimodal_tpu.ops import masking, morphology as morph


def _use_pallas_cc() -> bool:
    """Thumbnail-scale masks are labeled by the tiled VMEM-resident Pallas
    CC kernel on the TPU backend (``ops.pallas.cc.pallas_label_components_tiled``
    — per-tile on-chip fixpoint + cross-tile label merging, zero host
    round-trips); the XLA scan formulation serves every other backend."""
    from path_gene_multimodal_tpu.ops.pallas.flood import pallas_supported

    return pallas_supported()


def tissue_boundary_mask(
    thumb_rgb: np.ndarray,
    sat_threshold: float = 0.04,
    closing_radius: int = 6,
    min_size: int = 5000,
    max_work_dim: int = 1024,
) -> np.ndarray:
    """Thumbnail-space tissue mask (polygon_morphology.py:100-153).

    Masks larger than ``max_work_dim`` on the long side are processed at
    reduced resolution (morphology radii and area thresholds scaled) and
    upsampled back — connected-component labeling on multi-megapixel masks
    is iteration-bound and gains nothing from the extra resolution for
    island analytics.
    """
    import cv2

    h, w = thumb_rgb.shape[:2]
    scale = max(h, w) / max_work_dim if max(h, w) > max_work_dim else 1.0
    work = thumb_rgb
    if scale > 1.0:
        work = cv2.resize(
            thumb_rgb, (int(w / scale), int(h / scale)), interpolation=cv2.INTER_AREA
        )
        closing_radius = max(int(round(closing_radius / scale)), 1)
        min_size = max(int(round(min_size / (scale * scale))), 1)
    # bucket the work shape to multiples of 256 (zero padding = black =
    # background for the HSV mask): per-slide aspect ratios would
    # otherwise compile a fresh closing/CC program per slide
    wh, ww = work.shape[:2]
    ph, pw = ((wh + 255) // 256) * 256, ((ww + 255) // 256) * 256
    if (ph, pw) != (wh, ww):
        work = np.pad(work, ((0, ph - wh), (0, pw - ww), (0, 0)))
    mask = masking.tissue_mask_hsv(jnp.asarray(work), sat_threshold)
    mask = morph.binary_closing(mask, morph.disk(closing_radius))
    use_pallas = _use_pallas_cc()
    m = cc.remove_small_objects(mask, min_size, use_pallas=use_pallas)
    if (ph, pw) != (wh, ww):
        # hole-fill with the padding forced to FOREGROUND: zero padding
        # would connect right/bottom border pockets into one giant
        # background component that never fills, deviating from the
        # unpadded skimage semantics (ADVICE r2). True padding keeps each
        # pocket's exact in-image extent and is cropped away after.
        # wh/ww ride as device scalars so one program serves all shapes.
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
            < jnp.asarray(wh, jnp.int32)
        ) & (
            jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
            < jnp.asarray(ww, jnp.int32)
        )
        m = jnp.where(valid, m, True)
    m = cc.remove_small_holes(m, min_size, use_pallas=use_pallas)
    mask_np = np.asarray(m)[:wh, :ww]
    if scale > 1.0:
        mask_np = cv2.resize(
            mask_np.astype(np.uint8), (w, h), interpolation=cv2.INTER_NEAREST
        ).astype(bool)
    return mask_np


def mask_to_thumb_polygons(mask: np.ndarray, max_work_dim: int = 1024) -> list[np.ndarray]:
    """Per-component exterior rings (x, y) in thumbnail px. Large masks are
    labeled at reduced resolution (ring coordinates scaled back)."""
    import cv2

    mask = np.asarray(mask)
    h, w = mask.shape
    scale = max(h, w) / max_work_dim if max(h, w) > max_work_dim else 1.0
    if scale > 1.0:
        small = cv2.resize(
            mask.astype(np.uint8), (int(w / scale), int(h / scale)),
            interpolation=cv2.INTER_NEAREST,
        ).astype(bool)
        return [r * scale for r in mask_to_thumb_polygons(small, max_work_dim)]
    # bucket the labeling shape to multiples of 256 (padding = background)
    # so heterogeneous thumbnails share compiled CC programs
    ph, pw = ((h + 255) // 256) * 256, ((w + 255) // 256) * 256
    mask_p = np.pad(mask, ((0, ph - h), (0, pw - w)))
    if _use_pallas_cc():
        from path_gene_multimodal_tpu.ops.pallas.cc import pallas_label_components_tiled

        lbl_dev = pallas_label_components_tiled(jnp.asarray(mask_p), 1)
    else:
        lbl_dev = cc.label_components(jnp.asarray(mask_p), 1)
    lbl, n = cc.compact_labels(np.asarray(lbl_dev)[:h, :w])
    return [r[:, ::-1] for r in ct.component_rings(lbl, n)]  # (row,col)→(x,y)


def _ring_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Polygon (area-weighted) centroid via the shoelace formula."""
    r = np.asarray(ring, np.float64)
    x, y = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cross = x * y2 - x2 * y
    a = cross.sum() / 2.0
    if abs(a) < 1e-12:
        return float(x.mean()), float(y.mean())
    cx = float(((x + x2) * cross).sum() / (6.0 * a))
    cy = float(((y + y2) * cross).sum() / (6.0 * a))
    return cx, cy


def island_table_one_slide_level0(
    slide_id: str,
    geojson_path: str | Path,
    tumor_classes: Sequence[str],
    til_classes: Sequence[str],
    tls_classes: Sequence[str],
    tissue_area_px2: float,
) -> pd.DataFrame:
    """One row per tumor/til/tls island, LEVEL-0 coords
    (polygon_morphology.py:214-263 — column parity)."""
    features = load_geojson(geojson_path)
    rows: list[dict[str, Any]] = []

    def add_rows(polys: list[Mapping[str, Any]], typ: str) -> None:
        for idx, f in enumerate(polys, start=1):
            ring = np.asarray(f["exterior"], np.float64)
            area, perim = polygon_ring_area_perimeter(ring)
            cx, cy = _ring_centroid(ring)
            rows.append(
                {
                    "slide_id": slide_id,
                    "type": typ,
                    "island_id": idx,
                    "area_px2": float(f.get("area_px2") or area),
                    "perimeter_px": float(f.get("perimeter_px") or perim),
                    "centroid_x": cx,
                    "centroid_y": cy,
                    "bbox_xmin": float(ring[:, 0].min()),
                    "bbox_ymin": float(ring[:, 1].min()),
                    "bbox_xmax": float(ring[:, 0].max()),
                    "bbox_ymax": float(ring[:, 1].max()),
                    "tissue_area_px2": float(tissue_area_px2),
                }
            )

    def by(classes):
        wanted = set(classes)
        return [f for f in features if f["class_name"] in wanted]

    add_rows(by(tumor_classes), "tumor")
    add_rows(by(til_classes), "til")
    add_rows(by(tls_classes), "tls")
    columns = [
        "slide_id", "type", "island_id", "area_px2", "perimeter_px",
        "centroid_x", "centroid_y", "bbox_xmin", "bbox_ymin", "bbox_xmax",
        "bbox_ymax", "tissue_area_px2",
    ]
    return pd.DataFrame(rows, columns=columns)


def process_one_slide_make_csv_and_plot(
    slide: SlideReader,
    geojson_path: str | Path,
    out_dir: str | Path,
    stem: str,
    tumor_classes: Sequence[str],
    til_classes: Sequence[str],
    tls_classes: Sequence[str],
    thumb_size: tuple[int, int] = (2000, 2000),
) -> pd.DataFrame:
    """→ ``<stem>_islands.csv`` + ``<stem>_boundaries.png``
    (polygon_morphology.py:267-359)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    thumb = slide.get_thumbnail(thumb_size)
    w0, h0 = slide.level_dimensions[0]
    scale = w0 / thumb.shape[1]  # level-0 px per thumb px
    mask = tissue_boundary_mask(thumb)
    tissue_area_px2 = float(mask.sum()) * scale * scale

    df = island_table_one_slide_level0(
        stem, geojson_path, tumor_classes, til_classes, tls_classes, tissue_area_px2
    )
    df.to_csv(out_dir / f"{stem}_islands.csv", index=False)

    # boundaries plot: tissue contours + class island boundaries in thumb space
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.imshow(thumb)
    for ring in mask_to_thumb_polygons(mask):
        ax.plot(ring[:, 0], ring[:, 1], color="black", lw=1.0)
    colors = {"tumor": "#d62728", "til": "#2ca02c", "tls": "#1f77b4"}
    features = load_geojson(geojson_path)
    group_of = {}
    for c in tumor_classes:
        group_of[c] = "tumor"
    for c in til_classes:
        group_of[c] = "til"
    for c in tls_classes:
        group_of[c] = "tls"
    for f in features:
        grp = group_of.get(f["class_name"])
        if grp is None:
            continue
        ring = np.asarray(f["exterior"]) / scale
        ax.plot(ring[:, 0], ring[:, 1], color=colors[grp], lw=1.2)
    ax.set_aspect("equal", adjustable="box")
    ax.set_axis_off()
    fig.savefig(out_dir / f"{stem}_boundaries.png", dpi=200, bbox_inches="tight")
    plt.close(fig)
    return df


def write_basic_size_burden_metrics_txt(
    df_islands: pd.DataFrame,
    slide_id: str,
    out_txt_path: str | Path,
) -> Path:
    """Append the BASIC SIZE & BURDEN METRICS block (untitled.py:45-112;
    identical layout so downstream parsers keep working)."""
    tissue_area = (
        float(df_islands["tissue_area_px2"].iloc[0])
        if len(df_islands) and "tissue_area_px2" in df_islands.columns
        else 0.0
    )

    def sum_area(typ: str) -> float:
        if "type" not in df_islands.columns:
            return 0.0
        sub = df_islands[df_islands["type"] == typ]
        return float(sub["area_px2"].sum()) if not sub.empty else 0.0

    tumor_area = sum_area("tumor")
    til_area = sum_area("til")
    tls_area = sum_area("tls")
    immune_area = til_area + tls_area
    frac = lambda a: a / tissue_area if tissue_area > 0 else None
    tumor_frac, til_frac, tls_frac, immune_frac = map(
        frac, (tumor_area, til_area, tls_area, immune_area)
    )
    denom = tumor_area + immune_area
    immune_dom = immune_area / denom if denom > 0 else None

    out_txt_path = Path(out_txt_path)
    with open(out_txt_path, "a") as f:
        f.write("\n" + "=" * 60 + "\n")
        f.write("I. BASIC SIZE & BURDEN METRICS\n")
        f.write("=" * 60 + "\n")
        f.write(f"Slide ID: {slide_id}\n")
        f.write(f"Timestamp: {datetime.now().isoformat(timespec='seconds')}\n\n")
        f.write(f"Tissue area (px^2):        {tissue_area:.3e}\n")
        f.write(f"Tumor area (px^2):         {tumor_area:.3e}\n")
        f.write(f"TIL area (px^2):           {til_area:.3e}\n")
        f.write(f"TLS area (px^2):           {tls_area:.3e}\n")
        f.write(f"Immune area (px^2):        {immune_area:.3e}\n\n")
        if tumor_frac is not None:
            f.write(f"Tumor / tissue fraction:   {tumor_frac:.4f}\n")
        if til_frac is not None:
            f.write(f"TIL / tissue fraction:     {til_frac:.4f}\n")
        if tls_frac is not None:
            f.write(f"TLS / tissue fraction:     {tls_frac:.4f}\n")
        if immune_frac is not None:
            f.write(f"Immune / tissue fraction:  {immune_frac:.4f}\n")
        f.write("\n")
        if immune_dom is not None:
            f.write(
                "Immune dominance index\n"
                f"(immune / (tumor + immune)): {immune_dom:.4f}\n"
            )
        else:
            f.write("Immune dominance index: NA\n")
        f.write("\n")
    return out_txt_path
