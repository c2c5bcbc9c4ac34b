"""Molecular (IDaRS) biomarker prediction pipeline.

TPU-native rebuild of ``extract_molecular_features``
(``molecular_feature_extraction.py:246-349``):

1. load the annotations CSV (required-column check ``:54-66``) and select
   TME-ROI tiles (``:69-87``);
2. run the six IDaRS ResNet34 predictors over all selected tiles — as a
   single stacked/vmapped sweep (the reference reloads a model per task,
   SURVEY.md §3.3 hot loop) — keeping P(class=1) per task (``:136``);
3. merge ``<task>_prob`` columns into the annotations frame and write
   ``<stem>_molecular_features.csv`` (``:293-295``);
4. thumbnail at the requested objective power (``:142-153``), prob-map
   splat on device (``ops.scatter``), overlay PNGs per task + grid figure
   (``:193-243``), optional ``_prob_maps.npz``.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import jax.numpy as jnp
import numpy as np
import pandas as pd

from path_gene_multimodal_tpu.config import PipelineConfig
from path_gene_multimodal_tpu.io.slide import SlideReader
from path_gene_multimodal_tpu.models.resnet import IDaRSEnsemble
from path_gene_multimodal_tpu.ops.scatter import splat_prob_map
from path_gene_multimodal_tpu.utils.log import get_logger

from path_gene_multimodal_tpu.core.artifacts import (  # noqa: E402
    ANNOTATION_REQUIRED_COLUMNS as REQUIRED_COLUMNS,
)

DEFAULT_BASE_POWER = 40.0  # objective power at level 0 (0.25 mpp scanners)


@dataclass
class MolecularResult:
    features: pd.DataFrame
    prob_maps: np.ndarray | None  # (T, H, W)
    thumb: np.ndarray | None
    artifacts: dict


def load_tile_annotations(csv_path: str | Path) -> pd.DataFrame:
    from path_gene_multimodal_tpu.core.artifacts import read_annotations_csv

    return read_annotations_csv(csv_path)


def select_tme_tiles(df: pd.DataFrame) -> pd.DataFrame:
    sel = df[df["in_tme_roi"] == True]  # noqa: E712
    return sel.reset_index(drop=True)


def get_wsi_overview_and_dims(
    slide: SlideReader, power: float = 4.0, base_power: float | None = None
) -> tuple[np.ndarray, float]:
    """Thumbnail at the given objective power (TIAToolbox
    ``resolution=power, units="power"`` semantics, ref :142-153). Returns
    (thumb RGB, downsample = level0 px per thumb px).

    ``base_power`` defaults to the scanner power DERIVED from slide.mpp
    (the 10/mpp convention: 0.25 mpp ≈ 40x, 0.5 ≈ 20x — what TIAToolbox
    reads from metadata); only mpp-less slides fall back to the 40x
    assumption."""
    if base_power is None:
        mpp = getattr(slide, "mpp", None)
        base_power = (10.0 / mpp) if mpp else DEFAULT_BASE_POWER
    ds = base_power / power
    w0, h0 = slide.level_dimensions[0]
    thumb = slide.get_thumbnail((max(int(w0 / ds), 1), max(int(h0 / ds), 1)))
    return thumb, w0 / thumb.shape[1]


def extract_molecular_features(
    slide: SlideReader,
    annotations_csv: str | Path,
    out_dir: str | Path,
    stem: str,
    ensemble: IDaRSEnsemble,
    cfg: PipelineConfig,
    batch_size: int | None = None,
    write_artifacts: bool = True,
) -> MolecularResult:
    logger = get_logger()
    out_dir = Path(out_dir)
    mcfg = cfg.molecular
    tasks = list(ensemble.tasks)
    df = load_tile_annotations(annotations_csv)
    sel = select_tme_tiles(df)
    if len(sel) == 0:
        raise ValueError("no TME-ROI tiles for molecular prediction")

    tile = cfg.patch_size
    batch = batch_size or mcfg.batch_size
    coords = sel[["x", "y"]].to_numpy(np.int64)
    probs = np.zeros((len(tasks), len(coords)), np.float32)
    for start in range(0, len(coords), batch):
        chunk = coords[start : start + batch]
        tiles = np.stack(
            [slide.read_region((int(x), int(y)), 0, (tile, tile)) for x, y in chunk]
        )
        if len(chunk) < batch:
            tiles = np.concatenate(
                [tiles, np.zeros((batch - len(chunk), tile, tile, 3), np.uint8)]
            )
        out = np.asarray(ensemble(jnp.asarray(tiles)))
        probs[:, start : start + len(chunk)] = out[:, : len(chunk)]

    features = sel.copy()
    for ti, task in enumerate(tasks):
        features[f"{task}_prob"] = probs[ti]

    thumb, ds = get_wsi_overview_and_dims(slide, power=mcfg.thumb_power)
    box = max(int(round(tile / ds)), 1)
    xy_thumb = (coords / ds).astype(np.int32)
    maps = np.asarray(
        splat_prob_map(
            jnp.asarray(xy_thumb), jnp.asarray(probs),
            thumb.shape[0], thumb.shape[1], box,
        )
    )

    artifacts: dict = {}
    if write_artifacts:
        out_dir.mkdir(parents=True, exist_ok=True)
        csv_path = out_dir / f"{stem}_molecular_features.csv"
        features.to_csv(csv_path, index=False)
        artifacts["csv_path"] = csv_path
        overlays = save_overlays(thumb, maps, tasks, out_dir, stem)
        artifacts.update(overlays)
        if mcfg.save_prob_maps:
            npz = out_dir / f"{stem}_prob_maps.npz"
            np.savez_compressed(npz, **{t: maps[i] for i, t in enumerate(tasks)})
            artifacts["prob_maps_path"] = npz
        logger.info("molecular: %d tiles × %d tasks → %s", len(sel), len(tasks), csv_path)
    return MolecularResult(features=features, prob_maps=maps, thumb=thumb, artifacts=artifacts)


def save_overlays(
    thumb: np.ndarray,
    maps: np.ndarray,
    tasks: Sequence[str],
    out_dir: Path,
    stem: str,
    alpha: float = 0.5,
) -> dict:
    """Per-task probability overlay PNGs + one grid figure
    (ref :193-243 overlay_probability_map + grid plot)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out: dict = {"overlays": {}}
    for i, task in enumerate(tasks):
        fig, ax = plt.subplots(figsize=(8, 8))
        ax.imshow(thumb)
        hm = np.ma.masked_where(maps[i] <= 0, maps[i])
        im = ax.imshow(hm, cmap="jet", alpha=alpha, vmin=0, vmax=1)
        fig.colorbar(im, ax=ax, fraction=0.046)
        ax.set_title(f"{task} probability")
        ax.set_axis_off()
        p = out_dir / f"{stem}_{task}_overlay.png"
        fig.savefig(p, dpi=150, bbox_inches="tight")
        plt.close(fig)
        out["overlays"][task] = p
    n = len(tasks)
    ncols = 3
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 5 * nrows))
    for i, task in enumerate(tasks):
        ax = axes.flat[i]
        ax.imshow(thumb)
        hm = np.ma.masked_where(maps[i] <= 0, maps[i])
        ax.imshow(hm, cmap="jet", alpha=alpha, vmin=0, vmax=1)
        ax.set_title(task)
        ax.set_axis_off()
    for j in range(len(tasks), nrows * ncols):
        axes.flat[j].set_axis_off()
    grid_path = out_dir / f"{stem}_molecular_grid.png"
    fig.savefig(grid_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    out["grid_path"] = grid_path
    return out
