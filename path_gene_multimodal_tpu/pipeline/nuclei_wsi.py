"""Whole-slide HoverNeXt inference — the sliding-window mode.

The reference's canonical WSI configuration (``hovernet_inference.py``
script body ``:173-209``, SURVEY.md §3.4): window 256, stride 248 (the
``overlap=0.96875`` fraction), batched inference over the window stream,
overlapped post-processing stitched into one slide-scale uint32 instance
map (zarr ``pinst_pp.zip`` in the reference; ``.npz`` here).

TPU-native stitching strategy: each window is segmented independently on
device (the watershed needs only local context — nuclei are ≪ window) and
instances are accepted iff their centroid falls in the window's OWN
interior cell of the stride grid; border-crossing nuclei are therefore
claimed by exactly one window, replacing the reference's
``pp_tiling/pp_overlap`` CPU re-segmentation pass. Accepted instances are
written into the WSI-scale map with globally unique ids.

Output: ``(instance_map_path, nuclei table)`` — the table schema matches
``pipeline.nuclei`` so downstream (graphs, plotting) is source-agnostic.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

from path_gene_multimodal_tpu.config import PipelineConfig
from path_gene_multimodal_tpu.core.artifacts import write_nuclei_table
from path_gene_multimodal_tpu.io.slide import SlideReader
from path_gene_multimodal_tpu.pipeline.nuclei import NucleiModel, _tile_rows, _write_empty
from path_gene_multimodal_tpu.utils.log import StageTimer, get_logger


def iter_windows(
    slide_w: int, slide_h: int, window: int, stride: int
) -> list[tuple[int, int]]:
    """Top-left coords of a stride-grid covering the slide (windows at the
    right/bottom edge are clamped inside)."""
    xs = list(range(0, max(slide_w - window, 0) + 1, stride))
    ys = list(range(0, max(slide_h - window, 0) + 1, stride))
    if xs and xs[-1] + window < slide_w:
        xs.append(slide_w - window)
    if ys and ys[-1] + window < slide_h:
        ys.append(slide_h - window)
    if not xs:
        xs = [0]
    if not ys:
        ys = [0]
    return [(x, y) for y in ys for x in xs]


def run_hovernext_wsi(
    slide: SlideReader,
    out_dir: str | Path,
    stem: str,
    model: NucleiModel,
    cfg: PipelineConfig,
    batch_size: int | None = None,
    write_instance_map: bool = True,
    write_artifacts: bool = True,
    timer: StageTimer | None = None,
) -> tuple[Path | None, pd.DataFrame]:
    logger = get_logger()
    hx = cfg.hovernext
    window = model.cfg.input_size
    stride = int(round(window * hx.overlap))  # 256 * 0.96875 = 248
    batch = batch_size or hx.batch_size
    w0, h0 = slide.level_dimensions[0]
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    windows = iter_windows(w0, h0, window, stride)
    logger.info("WSI nuclei: %d windows of %d (stride %d) over %dx%d",
                len(windows), window, stride, w0, h0)

    inst_map_wsi = np.zeros((h0, w0), np.uint32) if write_instance_map else None
    rows: list[dict[str, Any]] = []
    next_id = 1
    # ownership: centroid's stride-cell index picks exactly one window (the
    # clamped last window absorbs the partial cell), so a nucleus seen by
    # several overlapping windows is accepted exactly once
    xs_grid = sorted({x for x, _ in windows})
    ys_grid = sorted({y for _, y in windows})

    def owner(coord: float, grid: list[int]) -> int:
        return grid[min(int(coord // stride), len(grid) - 1)]

    for start in range(0, len(windows), batch):
        chunk = windows[start : start + batch]
        tiles = np.stack(
            [slide.read_region((x, y), 0, (window, window)) for x, y in chunk]
        )
        if len(chunk) < batch:
            tiles = np.concatenate(
                [tiles, np.zeros((batch - len(chunk), window, window, 3), np.uint8)]
            )
        inst_maps, type_maps = model.segment(tiles)
        for bi, (wx, wy) in enumerate(chunk):
            inst = inst_maps[bi]
            types = type_maps[bi]
            sub_rows = _tile_rows(
                inst, types, wx, wy, window, out_dir, stem,
                model.max_instances, False, cfg,
            )
            for r in sub_rows:
                gx, gy = r["wsi_centroid_x"], r["wsi_centroid_y"]
                if owner(gx, xs_grid) != wx or owner(gy, ys_grid) != wy:
                    continue
                local_id = r["inst_id"]
                r["inst_id"] = next_id
                rows.append(r)
                if inst_map_wsi is not None:
                    ys, xs = np.nonzero(inst == local_id)
                    gy = np.clip(ys + wy, 0, h0 - 1)
                    gx = np.clip(xs + wx, 0, w0 - 1)
                    inst_map_wsi[gy, gx] = next_id
                next_id += 1
        if timer is not None and timer.records:
            timer.records[-1].items = start + len(chunk)

    nuclei = pd.DataFrame(rows)
    map_path = None
    if write_artifacts:
        if len(nuclei) == 0:
            nuclei = _write_empty(out_dir, stem, True)
        else:
            write_nuclei_table(out_dir / f"{stem}_hovernet_nuclei_wsi", nuclei)
        if inst_map_wsi is not None:
            map_path = out_dir / f"{stem}_pinst_pp.npz"
            np.savez_compressed(map_path, inst_map=inst_map_wsi)
    logger.info("WSI nuclei: %d instances", len(nuclei))
    return map_path, nuclei
