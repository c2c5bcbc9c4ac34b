"""HoverNeXt result plotting / TSV utilities.

Rebuild of ``hovernet_plotting.py`` (SURVEY.md §2 C19):

- ``load_centroid_tsv``: robust (x, y, name) TSV loader (``:4-40``) —
  tolerates missing headers, extra columns, comment lines;
- ``class_map_from_instances``: instance map + per-instance class lookup →
  per-pixel class map (``cls_map = lookup[inst_map]``, ``:44-73``; our
  instance maps come from ``pinst_pp.npz``);
- ``merge_pred_tsvs``: per-class ``pred_*.tsv`` centroid merge (``:77-108``);
- ``plot_class_centroids``: class-colored centroid scatter (``:113-154``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping, Sequence

import numpy as np
import pandas as pd

from path_gene_multimodal_tpu.config import TYPE_NAMES

_CLASS_COLORS = {
    1: "#d62728",  # neoplastic
    2: "#2ca02c",  # inflammatory
    3: "#1f77b4",  # connective
    4: "#7f7f7f",  # dead
    5: "#ff7f0e",  # epithelial
}


def load_centroid_tsv(path: str | Path) -> pd.DataFrame:
    """Robust TSV loader → columns [x, y, name]. Accepts headered or
    headerless files, extra columns, '#' comments."""
    path = Path(path)
    df = pd.read_csv(path, sep="\t", comment="#", header=None, dtype=str)
    # detect header row: first row not parseable as float in col 0
    first = df.iloc[0, 0]
    try:
        float(first)
        header = None
    except (TypeError, ValueError):
        header = [str(c).strip().lower() for c in df.iloc[0]]
        df = df.iloc[1:].reset_index(drop=True)
    if header and "x" in header and "y" in header:
        xi, yi = header.index("x"), header.index("y")
        ni = header.index("name") if "name" in header else None
    else:
        xi, yi, ni = 0, 1, (2 if df.shape[1] > 2 else None)
    out = pd.DataFrame(
        {
            "x": pd.to_numeric(df.iloc[:, xi], errors="coerce"),
            "y": pd.to_numeric(df.iloc[:, yi], errors="coerce"),
            "name": df.iloc[:, ni].astype(str) if ni is not None else path.stem,
        }
    ).dropna(subset=["x", "y"])
    return out.reset_index(drop=True)


def class_map_from_instances(
    inst_map: np.ndarray, inst_types: Mapping[int, int]
) -> np.ndarray:
    """Per-pixel class map via lookup-table gather (``cls_map =
    lookup[inst_map]``) — inst_types from class_inst.json {id: [type, ...]}."""
    inst_map = np.asarray(inst_map)
    max_id = int(inst_map.max()) if inst_map.size else 0
    lookup = np.zeros(max_id + 1, np.int32)
    for k, t in inst_types.items():
        k = int(k)
        if 0 <= k <= max_id:
            lookup[k] = int(t[0] if isinstance(t, (list, tuple)) else t)
    return lookup[inst_map]


def merge_pred_tsvs(tsv_dir: str | Path, pattern: str = "pred_*.tsv") -> pd.DataFrame:
    """Merge per-class centroid TSVs; class name from the filename
    (``pred_<class>.tsv``)."""
    frames = []
    for path in sorted(Path(tsv_dir).glob(pattern)):
        df = load_centroid_tsv(path)
        stem = path.stem
        # strip the conventional prefix only when present — a custom glob
        # like '*.tsv' must not lose the first 5 chars of the class name
        df["class_name"] = stem[len("pred_"):] if stem.startswith("pred_") else stem
        frames.append(df)
    if not frames:
        return pd.DataFrame(columns=["x", "y", "name", "class_name"])
    return pd.concat(frames, ignore_index=True)


def plot_class_centroids(
    centroids: pd.DataFrame,
    out_path: str | Path,
    class_column: str = "class_name",
    background: np.ndarray | None = None,
    point_size: float = 3.0,
) -> Path:
    """Class-colored centroid scatter (``:113-154``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    if background is not None:
        ax.imshow(background)
    name_to_id = {v: k for k, v in TYPE_NAMES.items()}
    for cls, group in centroids.groupby(class_column):
        tid = name_to_id.get(str(cls))
        color = _CLASS_COLORS.get(tid, "#000000")
        ax.scatter(group["x"], group["y"], s=point_size, color=color, label=str(cls))
    ax.legend(markerscale=3, fontsize=8)
    if background is None:
        ax.invert_yaxis()  # image coordinates
    ax.set_aspect("equal")
    out_path = Path(out_path)
    fig.savefig(out_path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return out_path
