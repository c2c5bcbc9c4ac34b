"""ASAP/TIGER XML annotation parsing + overlay.

Rebuild of ``publicly_annotated_file_tme_match.py`` (SURVEY.md §2 C21):
parse ASAP-format annotation XML (TIGER dataset) into Order-sorted polygon
coordinate arrays (``:15-47``), and draw them over slide thumbnails
(``:49-125``).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Any

import numpy as np

from path_gene_multimodal_tpu.io.slide import SlideReader


def parse_asap_xml(xml_path: str | Path) -> list[dict[str, Any]]:
    """→ [{name, group, coords (K, 2) level-0 float, type}] with per-polygon
    coordinates sorted by their ``Order`` attribute (ref :15-47)."""
    root = ET.parse(str(xml_path)).getroot()
    out: list[dict[str, Any]] = []
    for ann in root.iter("Annotation"):
        coords_el = ann.find("Coordinates")
        if coords_el is None:
            continue
        pts = []
        for c in coords_el.iter("Coordinate"):
            try:
                order = int(float(c.get("Order", "0")))
                x = float(c.get("X"))
                y = float(c.get("Y"))
            except (TypeError, ValueError):
                continue
            pts.append((order, x, y))
        if len(pts) < 3:
            continue
        pts.sort(key=lambda t: t[0])
        out.append(
            {
                "name": ann.get("Name", ""),
                "group": ann.get("PartOfGroup", ""),
                "type": ann.get("Type", "Polygon"),
                "coords": np.asarray([(x, y) for _, x, y in pts], np.float64),
            }
        )
    return out


def overlay_asap_annotations(
    slide: SlideReader,
    xml_path: str | Path,
    out_path: str | Path,
    thumb_size: tuple[int, int] = (2000, 2000),
    color_by_group: bool = True,
) -> Path:
    """Annotation polygons over the slide thumbnail (ref :49-125)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    anns = parse_asap_xml(xml_path)
    thumb = slide.get_thumbnail(thumb_size)
    w0, _ = slide.level_dimensions[0]
    scale = thumb.shape[1] / w0
    fig, ax = plt.subplots(figsize=(12, 12))
    ax.imshow(thumb)
    palette = plt.get_cmap("tab10")
    groups = sorted({a["group"] for a in anns})
    color_of = {g: palette(i % 10) for i, g in enumerate(groups)}
    seen = set()
    for a in anns:
        ring = a["coords"] * scale
        color = color_of[a["group"]] if color_by_group else "#d62728"
        label = a["group"] if a["group"] not in seen else None
        seen.add(a["group"])
        ax.plot(
            np.append(ring[:, 0], ring[0, 0]),
            np.append(ring[:, 1], ring[0, 1]),
            color=color, lw=1.0, label=label,
        )
    if groups and color_by_group:
        ax.legend(fontsize=7, loc="lower right")
    ax.set_axis_off()
    out_path = Path(out_path)
    fig.savefig(out_path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return out_path


def overlay_for_slide_dir(
    slides_dir: str | Path,
    xml_dir: str | Path,
    out_dir: str | Path,
    **kw: Any,
) -> dict[str, Path]:
    """Pair each slide with its same-stem XML and save overlays
    (ref script body :159-203)."""
    from path_gene_multimodal_tpu.config import slide_paths
    from path_gene_multimodal_tpu.io.slide import open_slide

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    outputs: dict[str, Path] = {}
    for wsi in slide_paths(slides_dir):
        xml = Path(xml_dir) / f"{wsi.stem}.xml"
        if not xml.exists():
            continue
        slide = open_slide(wsi)
        try:
            outputs[wsi.stem] = overlay_asap_annotations(
                slide, xml, out_dir / f"{wsi.stem}_annotation_overlay.png", **kw
            )
        finally:
            # one leaked fd per slide would EMFILE a long TIGER directory
            getattr(slide, "close", lambda: None)()
    return outputs
