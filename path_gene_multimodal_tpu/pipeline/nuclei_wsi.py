"""Whole-slide HoverNeXt inference — the sliding-window mode.

The reference's canonical WSI configuration (``hovernet_inference.py``
script body ``:173-209``, SURVEY.md §3.4): window 256, stride 248 (the
``overlap=0.96875`` fraction), batched inference over the window stream,
overlapped post-processing stitched into one slide-scale uint32 instance
map (zarr ``pinst_pp.zip`` in the reference; ``.npz`` here — sparse
(coo) for big slides so host RAM stays bounded).

TPU-native stitching strategy (replaces the reference's
``pp_tiling/pp_overlap`` CPU re-segmentation pass):

1. each window is segmented independently on device;
2. an instance whose mask does NOT touch a window border (its bbox and
   centroid are therefore exact) is accepted by the FIRST window that saw
   it whole — exactly-once among clean views;
3. an instance clipped by every window that sees it (it straddles a seam
   wider than the overlap) falls back to stride-cell centroid ownership;
4. a final proximity pass collapses residual seam duplicates (two clipped
   views of one nucleus whose biased centroids landed in different cells),
   keeping the larger fragment.

With overlap ≥ nucleus diameter, step 2 alone decides everything; the
reference's 8-px overlap (stride 248) relies on steps 3-4.
"""

from __future__ import annotations

import bisect
import time
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

from path_gene_multimodal_tpu.config import PipelineConfig
from path_gene_multimodal_tpu.core.artifacts import write_nuclei_table
from path_gene_multimodal_tpu.io.slide import SlideReader
from path_gene_multimodal_tpu.pipeline.nuclei import NucleiModel, _tile_rows, _write_empty
from path_gene_multimodal_tpu.pipeline.tessellate import decode_chunk_planar
from path_gene_multimodal_tpu.utils.log import StageTimer, get_logger

#: above this many level-0 pixels the instance map is written sparse
#: (ys/xs/ids arrays) instead of a dense (H, W) uint32 array
DENSE_MAP_MAX_PIXELS = 400_000_000


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


def contains_1d(lo: float, hi: float, w: int, grid: list[int], window: int) -> bool:
    """1-D window-interior containment of [lo, hi] by the window starting at
    ``w``: strict interior, except the slide-boundary windows may touch the
    outer edge (an instance at the slide edge is not clipped there)."""
    left_ok = lo > w or (w == grid[0] and lo >= w)
    right_ok = hi < w + window or (w == grid[-1] and hi <= w + window)
    return left_ok and right_ok


def axis_candidates(lo: float, hi: float, grid: list[int], window: int) -> list[int]:
    """Ascending window starts whose 1-D interior contains [lo, hi] — the
    strict set is the open interval (hi - window, lo), found with bisect
    instead of scanning the grid from the slide origin (the scan was
    O(grid) per nucleus = 10⁸ Python-level ops on big slides); the two
    boundary windows get their relaxed touch-allowed check."""
    i0 = bisect.bisect_right(grid, hi - window)
    i1 = bisect.bisect_left(grid, lo)
    cand = grid[i0:i1]
    for w in (grid[0], grid[-1]):
        if w not in cand and contains_1d(lo, hi, w, grid, window):
            cand = sorted(set(cand) | {w})
    return cand


def _dedup_seam_duplicates(
    rows: list[dict[str, Any]], radius: float = 32.0
) -> list[dict[str, Any]]:
    """Collapse clipped-view duplicates. Only pairs where at least one
    member is a CLIPPED view (``row["_clipped"]``) are candidates — two
    clean views were already made exactly-once by the containment rule, so
    genuinely distinct adjacent nuclei (both clean) are never merged.
    Duplicate test: centroids within ``radius`` AND strictly overlapping
    WSI bboxes (a clipped fragment's bbox is a sub-rectangle of the true
    nucleus bbox, so true duplicates always strictly overlap). Clean views
    win over clipped fragments; otherwise the larger area wins."""
    if len(rows) <= 1:
        return rows
    pts = np.array([[r["wsi_centroid_x"], r["wsi_centroid_y"]] for r in rows])
    boxes = np.array(
        [
            [r["wsi_bbox_xmin"], r["wsi_bbox_ymin"], r["wsi_bbox_xmax"], r["wsi_bbox_ymax"]]
            for r in rows
        ]
    )
    clipped = np.array([bool(r.get("_clipped", False)) for r in rows])
    areas = np.array([r.get("area", 0.0) for r in rows])
    # clean rows first (they must win their nucleus), then by area
    order = np.lexsort((-areas, clipped.astype(int)))
    cell = (pts / radius).astype(np.int64)
    claimed: dict[tuple[int, int], list[int]] = {}
    keep = np.zeros(len(rows), bool)

    def is_dup(i: int, j: int) -> bool:
        if not (clipped[i] or clipped[j]):
            return False  # two clean views are two real nuclei
        if np.hypot(*(pts[i] - pts[j])) > radius:
            return False
        bi, bj = boxes[i], boxes[j]
        return (
            bi[0] < bj[2] and bj[0] < bi[2] and bi[1] < bj[3] and bj[1] < bi[3]
        )

    for i in order:
        cx, cy = cell[i]
        dup = False
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for j in claimed.get((cx + dx, cy + dy), ()):
                    if is_dup(i, j):
                        dup = True
                        break
                if dup:
                    break
            if dup:
                break
        if not dup:
            claimed.setdefault((cx, cy), []).append(i)
            keep[i] = True
    return [r for i, r in enumerate(rows) if keep[i]]


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
    # drop any counts a previous (possibly aborted) run left behind — this
    # slide's overflow report must cover exactly this slide's batches
    getattr(model, "cc_overflow_tiles", lambda **_: 0)(reset=True)
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

    dense_map = write_instance_map and (w0 * h0) <= DENSE_MAP_MAX_PIXELS
    inst_map_wsi = np.zeros((h0, w0), np.uint32) if dense_map else None
    sparse_ys: list[np.ndarray] = []
    sparse_xs: list[np.ndarray] = []
    sparse_ids: list[np.ndarray] = []

    rows: list[dict[str, Any]] = []
    pixels: list[tuple[np.ndarray, np.ndarray]] = []  # per-row (ys, xs) in WSI px
    xs_grid = sorted({x for x, _ in windows})
    ys_grid = sorted({y for _, y in windows})

    def owner(coord: float, grid: list[int]) -> int:
        return grid[min(int(coord // stride), len(grid) - 1)]

    def window_contains(bx0, by0, bx1, by1, wx, wy) -> bool:
        return bx0 > wx and by0 > wy and bx1 < wx + window and by1 < wy + window

    def _contains_1d(lo: float, hi: float, w: int, grid: list[int]) -> bool:
        return contains_1d(lo, hi, w, grid, window)

    def first_containing_window(bx0, by0, bx1, by1) -> tuple[int, int] | None:
        """Lowest-index window whose interior contains the bbox (computable
        from the grids without running that window)."""
        ys_c = axis_candidates(by0, by1, ys_grid, window)
        if not ys_c:
            return None
        xs_c = axis_candidates(bx0, bx1, xs_grid, window)
        if not xs_c:
            return None
        return (xs_c[0], ys_c[0])

    # half-bandwidth planar feed (ops/jpegcolor.py): per-chunk, because the
    # slide-edge windows appended by iter_windows can sit at odd coords —
    # those chunks fall back to RGB while the stride-248 interior streams
    # planar
    planar = (
        hx.planar_feed
        and window % 2 == 0
        and getattr(model, "_mesh", None) is None
        and getattr(slide, "supports_planar", lambda level=0: False)()
    )

    def _decode_chunk(chunk):
        if planar:
            # odd-coord chunks (slide-edge windows) fall back to RGB inside
            # the helper; the stride-248 interior streams planar
            planes = decode_chunk_planar(slide, chunk, window, batch)
            if planes is not None:
                return chunk, ("planar", *planes)
        tiles = np.stack(
            [slide.read_region((x, y), 0, (window, window)) for x, y in chunk]
        )
        if len(chunk) < batch:
            tiles = np.concatenate(
                [tiles, np.zeros((batch - len(chunk), window, window, 3), np.uint8)]
            )
        return chunk, ("rgb", tiles)

    def _group_instance_pixels(inst: np.ndarray) -> dict[int, tuple[np.ndarray, np.ndarray]]:
        """One pass over the window: {id: (ys, xs)} — replaces the per-kept-
        nucleus full-window np.nonzero scan."""
        ys, xs = np.nonzero(inst > 0)
        if len(ys) == 0:
            return {}
        ids = inst[ys, xs]
        order = np.argsort(ids, kind="stable")
        ids, ys, xs = ids[order], ys[order], xs[order]
        uniq = np.unique(ids)
        bounds = np.searchsorted(ids, uniq, side="left")
        out = {}
        for j, uid in enumerate(uniq):
            lo = bounds[j]
            hi = bounds[j + 1] if j + 1 < len(bounds) else len(ids)
            out[int(uid)] = (ys[lo:hi], xs[lo:hi])
        return out

    from functools import partial

    from path_gene_multimodal_tpu.ops.instances import (
        groups_from_sparse,
        instance_features_batch,
        pack_features_sparse,
        pack_labels_sparse,
        unpack_features_sparse,
        unpack_labels_sparse,
    )
    from path_gene_multimodal_tpu.ops.pallas.flood import pallas_supported as _pallas_ok

    import jax
    import jax.numpy as jnp

    # Single-device mode: instance features AND a sparse encoding of the
    # label maps are computed ON DEVICE from the arrays segment() already
    # produced. Only the sparse pixels + live feature slots cross the link
    # (the axon tunnel moves ~25 MB/s; a batch of dense maps is seconds of
    # D2H that serializes with the next batch's compute on the device
    # stream — measured 7.7 s of 20.9 s for a 1089-window slide). Mesh
    # mode keeps the dense host hop: GSPMD cannot partition the Pallas
    # stats custom call over sharded inputs.
    feats_on_device = getattr(model, "_mesh", None) is None

    n_px = batch * window * window
    n_slots = batch * model.max_instances
    # budget ladders: start near the typical nuclei occupancy, ratchet ×4
    # when a batch overflows (that batch falls back to a dense transfer;
    # later batches re-pack at the larger size — ≤2 dense batches/slide)
    lbl_budgets = [max(n_px // 32, 4096), n_px // 8, n_px // 2]
    feat_budgets = [max(n_slots // 16, 512), n_slots // 4]
    pack_level = {"lbl": 0, "feat": 0}

    @partial(jax.jit, static_argnums=(2, 3))
    def _feats_pack_fn(lbl, tp, lbl_budget: int, feat_budget: int):
        feats = instance_features_batch(
            lbl.astype(jnp.int32), tp.astype(jnp.int32),
            max_instances=model.max_instances, use_pallas=_pallas_ok(),
        )
        cnt, idx, ids = pack_labels_sparse(lbl, lbl_budget)
        fcnt, fidx, fpacked = pack_features_sparse(feats, feat_budget)
        return cnt, idx, ids, fcnt, fidx, fpacked, feats

    class _DenseFallback:
        """Keeps the dense device arrays alive (NOT transferred) so an
        overflowing batch can refetch them; carries the budgets the batch
        was packed with."""

        __slots__ = ("lbl", "feats", "lbl_budget", "feat_budget")

        def __init__(self, lbl, feats, lbl_budget, feat_budget):
            self.lbl, self.feats = lbl, feats
            self.lbl_budget, self.feat_budget = lbl_budget, feat_budget

    def _warn_cap(inst_max: int) -> None:
        if inst_max >= model.max_instances:
            logger.warning(
                "window batch has >= %d instances; ids beyond the cap are "
                "dropped (raise cfg.hovernext.max_instances_per_tile)",
                model.max_instances,
            )

    def _process_sparse(chunk, cnt, idx, ids, fcnt, fidx, fpacked, fb) -> None:
        n = int(cnt)
        if n > fb.lbl_budget:  # truncated encoding → dense refetch
            inst_np = np.asarray(fb.lbl).astype(np.int32)
            groups_bw = None
            if pack_level["lbl"] < len(lbl_budgets) - 1:
                pack_level["lbl"] += 1
                logger.info(
                    "sparse label budget %d overflowed (%d px); next "
                    "batches pack at %d", fb.lbl_budget, n,
                    lbl_budgets[pack_level["lbl"]],
                )
        else:
            inst_np = unpack_labels_sparse(cnt, idx, ids, (batch, window, window))
            groups_bw = (
                groups_from_sparse(cnt, idx, ids, batch, window, window)
                if write_instance_map else None
            )
        _warn_cap(int(inst_np.max(initial=0)))
        fn = int(fcnt)
        if fn > fb.feat_budget:
            chunk_feats = {k: np.asarray(v) for k, v in fb.feats.items()}
            if pack_level["feat"] < len(feat_budgets) - 1:
                pack_level["feat"] += 1
        else:
            chunk_feats = unpack_features_sparse(
                fcnt, fidx, fpacked, batch, model.max_instances
            )
        _emit_rows(chunk, inst_np, None, chunk_feats, groups_bw)

    def _process_dense(chunk, inst_maps, type_maps) -> None:
        # mesh mode: dense maps cross the link; features from host copies
        inst_np = np.asarray(inst_maps).astype(np.int32)
        type_np = np.asarray(type_maps).astype(np.int32)
        _warn_cap(int(inst_np.max(initial=0)))
        feats_dev = instance_features_batch(
            jnp.asarray(inst_np), jnp.asarray(type_np),
            max_instances=model.max_instances,
            use_pallas=_pallas_ok(),
        )
        chunk_feats = {k: np.asarray(v) for k, v in feats_dev.items()}
        _emit_rows(chunk, inst_np, type_np, chunk_feats, None)

    def _emit_rows(chunk, inst_np, type_np, chunk_feats, groups_bw) -> None:
        for bi, (wx, wy) in enumerate(chunk):
            inst = inst_np[bi]
            feats_bi = {k: v[bi] for k, v in chunk_feats.items()}
            sub_rows = _tile_rows(
                inst, type_np[bi] if type_np is not None else None,
                wx, wy, out_dir, stem,
                model.max_instances, False, cfg, feats=feats_bi,
            )
            if groups_bw is not None:
                groups = groups_bw[bi]
            else:
                groups = _group_instance_pixels(inst) if write_instance_map else {}
            for r in sub_rows:
                bx0 = r["wsi_bbox_xmin"]
                by0 = r["wsi_bbox_ymin"]
                bx1 = r["wsi_bbox_xmax"]
                by1 = r["wsi_bbox_ymax"]
                touches_border = not window_contains(bx0, by0, bx1, by1, wx, wy)
                at_slide_edge = bx0 <= 0 or by0 <= 0 or bx1 >= w0 or by1 >= h0
                if not touches_border or at_slide_edge:
                    # clean view: exactly-once via first-containing-window
                    fw = first_containing_window(bx0, by0, bx1, by1)
                    if fw is None and touches_border:
                        # slide-edge nucleus ALSO straddling a seam: every
                        # view is clipped and computes fw from its own
                        # biased bbox (each getting None/a different
                        # window) — route through stride-cell centroid
                        # ownership and mark clipped so the proximity pass
                        # collapses residual duplicates
                        gx, gy = r["wsi_centroid_x"], r["wsi_centroid_y"]
                        if owner(gx, xs_grid) != wx or owner(gy, ys_grid) != wy:
                            continue
                        r["_clipped"] = True
                    else:
                        if fw is not None and fw != (wx, wy):
                            continue
                        r["_clipped"] = touches_border and not at_slide_edge
                else:
                    # clipped in every view → stride-cell centroid ownership
                    gx, gy = r["wsi_centroid_x"], r["wsi_centroid_y"]
                    if owner(gx, xs_grid) != wx or owner(gy, ys_grid) != wy:
                        continue
                    r["_clipped"] = True
                local_id = r["inst_id"]
                rows.append(r)
                if write_instance_map:
                    ys, xs = groups.get(local_id, (np.zeros(0, np.int64),) * 2)
                    pixels.append(
                        (
                            np.clip(ys + wy, 0, h0 - 1).astype(np.int64),
                            np.clip(xs + wx, 0, w0 - 1).astype(np.int64),
                        )
                    )

    # three-stage pipeline: threaded decode → async device dispatch →
    # host row-building for batch k while batch k+1 computes (the shared
    # driver lives in pipeline.nuclei)
    from path_gene_multimodal_tpu.pipeline.nuclei import pipelined_batches

    chunks = [windows[s : s + batch] for s in range(0, len(windows), batch)]
    # own the stage record (records[-1] during the call would be whatever
    # stage finished BEFORE this one — StageTimer appends on context exit)
    rec = None
    if timer is not None:
        from path_gene_multimodal_tpu.utils.log import StageRecord

        rec = StageRecord(name="hovernext_wsi_segment", seconds=0.0)
        timer.records.append(rec)
    t_seg0 = time.perf_counter()

    def _step(item):
        chunk, payload = item
        if payload[0] == "planar":
            from path_gene_multimodal_tpu.ops.jpegcolor import ycbcr420_to_rgb_jit

            tiles = ycbcr420_to_rgb_jit(
                jnp.asarray(payload[1]), jnp.asarray(payload[2])
            )
        else:
            tiles = payload[1]
        dispatch = getattr(model, "segment_async", model.segment)
        lbl_dev, tp_dev = dispatch(tiles)
        if not feats_on_device:
            return chunk, lbl_dev, tp_dev
        lb = lbl_budgets[pack_level["lbl"]]
        fb = feat_budgets[pack_level["feat"]]
        cnt, idx, ids, fcnt, fidx, fpacked, feats_dev = _feats_pack_fn(
            lbl_dev, tp_dev, lb, fb
        )
        # the driver only async-copies top-level array args — enqueue the
        # dict's arrays here so every transfer rides behind this batch's
        # compute like the sparse arrays do
        for v in fpacked.values():
            v.copy_to_host_async()
        return (chunk, cnt, idx, ids, fcnt, fidx, fpacked,
                _DenseFallback(lbl_dev, feats_dev, lb, fb))

    def _on_batch(i, args):
        if rec is not None:
            rec.items = i * batch + len(args[0])
            rec.seconds = time.perf_counter() - t_seg0

    pipelined_batches(
        chunks, _decode_chunk, _step,
        _process_sparse if feats_on_device else _process_dense,
        on_batch=_on_batch,
    )

    n_over = getattr(model, "cc_overflow_tiles", lambda **_: 0)(reset=True)
    if n_over:
        logger.warning(
            "%s: %d window(s) exceeded the CC slot budget — components "
            "beyond it were dropped (no-silent-caps counter)", stem, n_over,
        )
    if rec is not None:
        rec.seconds = time.perf_counter() - t_seg0
        rec.extra = {**(rec.extra or {}), "cc_slot_overflow_tiles": n_over}

    # residual seam duplicates (both views clipped, centroids in different
    # cells) — keep the larger fragment
    keep_rows = _dedup_seam_duplicates(rows)
    kept = {id(r) for r in keep_rows}
    final_rows = []
    next_id = 1
    for i, r in enumerate(rows):
        if id(r) not in kept:
            continue
        r.pop("_clipped", None)
        r["inst_id"] = next_id
        final_rows.append(r)
        if write_instance_map:
            ys, xs = pixels[i]
            if inst_map_wsi is not None:
                inst_map_wsi[ys, xs] = next_id
            else:
                sparse_ys.append(ys.astype(np.int32))
                sparse_xs.append(xs.astype(np.int32))
                sparse_ids.append(np.full(len(ys), next_id, np.uint32))
        next_id += 1

    nuclei = pd.DataFrame(final_rows)
    map_path = None
    if write_artifacts:
        if len(nuclei) == 0:
            nuclei = _write_empty(out_dir, stem, True)
        else:
            write_nuclei_table(out_dir / f"{stem}_hovernet_nuclei_wsi", nuclei)
        if write_instance_map:
            from path_gene_multimodal_tpu.core.artifacts import savez_fast

            map_path = out_dir / f"{stem}_pinst_pp.npz"
            if inst_map_wsi is not None:
                # reference-contract sidecar: zarr zip (1, H, W) uint32
                # (consumers: aggregated_hovernet_run.py:163-166,
                # hovernet_plotting.py:44-73); sparse maps stay npz-only.
                # The npz and the zip each deflate the full map (hundreds
                # of MB on big slides) — run both compressions in parallel
                # threads (zlib releases the GIL), halving the serial
                # finalize tail after the segment loop
                from concurrent.futures import ThreadPoolExecutor

                from path_gene_multimodal_tpu.io.zarrzip import write_zarr_zip

                with ThreadPoolExecutor(max_workers=2) as wpool:
                    fut_npz = wpool.submit(
                        savez_fast, map_path, inst_map=inst_map_wsi
                    )
                    fut_zip = wpool.submit(
                        write_zarr_zip,
                        out_dir / f"{stem}_pinst_pp.zip", inst_map_wsi[None],
                    )
                    fut_npz.result()
                    fut_zip.result()
            else:
                # the sparse path IS the huge-map case (dense map too big
                # to materialize) — its coordinate arrays are the largest
                # npz this stage writes
                savez_fast(
                    map_path,
                    ys=np.concatenate(sparse_ys) if sparse_ys else np.zeros(0, np.int32),
                    xs=np.concatenate(sparse_xs) if sparse_xs else np.zeros(0, np.int32),
                    ids=np.concatenate(sparse_ids) if sparse_ids else np.zeros(0, np.uint32),
                    shape=np.asarray([h0, w0], np.int64),
                )
    logger.info("WSI nuclei: %d instances", len(nuclei))
    return map_path, nuclei


def load_instance_map(path: str | Path) -> np.ndarray:
    """Load a ``<stem>_pinst_pp.npz`` (dense or sparse) or a zarr
    ``pinst_pp.zip`` instance map (squeezed to (H, W) like the
    reference's consumers)."""
    path = Path(path)
    if path.suffix == ".zip":
        from path_gene_multimodal_tpu.io.zarrzip import read_zarr_zip

        arr = read_zarr_zip(path)
        return arr[0] if arr.ndim == 3 and arr.shape[0] == 1 else arr
    with np.load(path) as z:
        if "inst_map" in z:
            return z["inst_map"]
        h, w = z["shape"]
        out = np.zeros((int(h), int(w)), np.uint32)
        out[z["ys"], z["xs"]] = z["ids"]
        return out
