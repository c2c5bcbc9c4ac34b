"""Step 1/8 — tissue segmentation + tiling.

TPU-native rebuild of the reference's Mussel tessellation wrapper
(``tiling.py:8-50``): thumbnail decode → on-device Otsu/HSV tissue mask →
tile grid → per-tile foreground fraction (integral-image pooling, one XLA
kernel) → foreground tile coords.

Artifacts (parity with ``tiling.py:32-50``): ``<slide>.h5`` (canonical
coords + attrs), ``mask.png``, ``grid_mask.png``, ``thumbnail.png``
(1024 px). Per-tile ``patches/*.png`` are optional (`write_patch_pngs`) —
the TPU pipeline streams decoded tiles straight to the embedding stage
instead of round-tripping PNGs through the filesystem.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np

from path_gene_multimodal_tpu.config import PipelineConfig, resolve_tile_png_name
from path_gene_multimodal_tpu.core.artifacts import write_tessellation_h5
from path_gene_multimodal_tpu.io.slide import SlideReader
from path_gene_multimodal_tpu.ops import gridops, masking


@dataclass
class TessellationResult:
    coords: np.ndarray          # (N, 2) int64 level-0 top-left px, row-major
    tile_size: int
    slide_dims: tuple[int, int]  # (w, h) level 0
    mask: np.ndarray            # bool thumbnail-resolution tissue mask
    mask_scale: float           # level-0 px per mask px
    h5_path: Path | None = None

    @property
    def num_tiles(self) -> int:
        return len(self.coords)


def run_tessellation(
    slide: SlideReader,
    out_dir: str | Path,
    cfg: PipelineConfig,
    stem: str | None = None,
    write_artifacts: bool = True,
) -> TessellationResult:
    out_dir = Path(out_dir)
    t = cfg.tessellation
    patch = cfg.patch_size
    w0, h0 = slide.level_dimensions[0]
    stem = stem or (Path(getattr(slide, "path", "slide") or "slide").stem)

    # canonical-shape masking: pad the thumbnail to (S, S) and pass the
    # valid extent + tile edges as DYNAMIC operands, so one compiled
    # program serves every slide — per-slide thumbnail shapes/mpp would
    # recompile the mask+grid programs per slide (minutes each over a
    # remote-compile link)
    s_canon = t.thumbnail_size
    thumb = slide.get_thumbnail((s_canon, s_canon))
    th, tw = thumb.shape[:2]
    thumb_p = np.zeros((s_canon, s_canon, 3), thumb.dtype)
    thumb_p[:th, :tw] = thumb
    mask_dev = masking.tissue_mask(
        jnp.asarray(thumb_p), use_otsu=t.use_otsu,
        segment_threshold=t.segment_threshold,
        valid_hw=jnp.asarray([th, tw], jnp.int32),
    )
    mask_scale = w0 / tw

    y0, y1, x0, x1, ny, nx = gridops.tile_edges_for_scale(
        th, tw, patch, mask_scale
    )
    # edge arrays can exceed s_canon on very large slides (ny≈h0/patch is
    # unbounded while the thumbnail caps at s_canon): bucket their length
    # by doubling — one extra compiled program per rare huge-slide bucket,
    # instead of np.pad crashing on a negative width
    n_edge = s_canon
    while n_edge < max(ny, nx):
        n_edge *= 2
    pad1 = lambda e: np.pad(e, (0, n_edge - len(e)))  # y0==y1 → frac 0
    frac = gridops.tile_foreground_fraction_edges(
        mask_dev, *(jnp.asarray(pad1(e)) for e in (y0, y1, x0, x1))
    )
    # threshold ON DEVICE (same f32 compare, canonical shape → one cached
    # program) and ship the 1-byte keep grid instead of the full float32
    # frac canvas — 4× fewer D2H bytes over a ~25 MB/s tunnel
    keep = np.asarray(frac >= np.float32(t.min_foreground_frac))[:ny, :nx]
    mask = np.asarray(mask_dev)[:th, :tw]
    # np.nonzero on a 2-D array is already row-major (y outer, x ascending
    # within y) — the reference's H5 layout
    gy, gx = np.nonzero(keep)
    coords = np.stack([gx * patch, gy * patch], axis=1).astype(np.int64)

    result = TessellationResult(
        coords=coords,
        tile_size=patch,
        slide_dims=(w0, h0),
        mask=np.asarray(mask),
        mask_scale=mask_scale,
    )

    if write_artifacts:
        out_dir.mkdir(parents=True, exist_ok=True)
        h5_path = out_dir / f"{stem}.h5"
        write_tessellation_h5(
            h5_path,
            coords,
            tile_size=patch,
            mpp=slide.mpp,
            extra_attrs={"slide_width": w0, "slide_height": h0},
        )
        result.h5_path = h5_path
        _save_png(out_dir / "thumbnail.png", thumb)
        _save_png(out_dir / "mask.png", (np.asarray(mask) * 255).astype(np.uint8))
        grid_vis = (keep * 255).astype(np.uint8)
        _save_png(out_dir / "grid_mask.png", grid_vis)
        if t.write_patch_pngs:
            patches_dir = out_dir / "patches"
            patches_dir.mkdir(exist_ok=True)
            for i, (x, y) in enumerate(coords):
                tile = slide.read_region((int(x), int(y)), 0, (patch, patch))
                name = resolve_tile_png_name(int(x), int(y), i, cfg.compat)
                _save_png(patches_dir / name, tile)
        if not h5_path.exists():  # output-existence oracle (tiling.py:46-50)
            raise RuntimeError(f"tessellation failed to produce {h5_path}")
    return result


def _save_png(path: Path, img: np.ndarray) -> None:
    import cv2

    if img.ndim == 3:
        cv2.imwrite(str(path), img[:, :, ::-1])
    else:
        cv2.imwrite(str(path), img)


def _decode_batch(
    slide: SlideReader,
    chunk: np.ndarray,
    tile_size: int,
    batch_size: int,
    pad_to_batch: bool,
) -> tuple[np.ndarray, np.ndarray]:
    # native fast path: pre-decode exactly the TIFF tiles this chunk
    # touches in one threaded C++ batch (populates the reader's LRU cache)
    prefetch_regions = getattr(slide, "prefetch_regions", None)
    if prefetch_regions is not None and len(chunk):
        prefetch_regions(chunk, 0, (tile_size, tile_size))
    tiles = np.stack(
        [
            slide.read_region((int(x), int(y)), 0, (tile_size, tile_size))
            for x, y in chunk
        ]
    )
    valid = np.ones(len(chunk), dtype=bool)
    if pad_to_batch and len(chunk) < batch_size:
        pad = batch_size - len(chunk)
        tiles = np.concatenate(
            [tiles, np.zeros((pad, tile_size, tile_size, 3), np.uint8)]
        )
        valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
    return tiles, valid


def decode_chunk_planar(
    slide: SlideReader,
    chunk: np.ndarray,
    tile_size: int,
    batch_size: int | None = None,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Shared planar 4:2:0 chunk decode behind the embed / nuclei /
    nuclei_wsi half-bandwidth feeds. Returns (Y (B,T,T), CbCr
    (B,T/2,T/2,2)) uint8, batch-padded with black (Y=0, Cb=Cr=128 — the
    planar analog of the RGB path's zero pad) up to ``batch_size``; or
    ``None`` when any region in the chunk cannot be served planar (odd
    coords/geometry, non-4:2:0 tile, reader without planar support) — the
    caller then falls back to the RGB path for this chunk."""
    chunk = np.asarray(chunk).reshape(-1, 2)
    rrp = getattr(slide, "read_region_planar", None)
    if (
        rrp is None
        or len(chunk) == 0
        or tile_size % 2
        or bool(np.any(chunk % 2))
    ):
        return None
    pre = getattr(slide, "prefetch_regions_planar", None)
    if pre is not None:
        pre(chunk, 0, (tile_size, tile_size))
    ys, cs = [], []
    for x, y in chunk:
        planes = rrp((int(x), int(y)), 0, (tile_size, tile_size))
        if planes is None:
            return None
        ys.append(planes[0])
        cs.append(planes[1])
    yb, cb = np.stack(ys), np.stack(cs)
    if batch_size is not None and len(chunk) < batch_size:
        pad = batch_size - len(chunk)
        yb = np.concatenate(
            [yb, np.zeros((pad, tile_size, tile_size), np.uint8)]
        )
        cb = np.concatenate(
            [cb, np.full((pad, tile_size // 2, tile_size // 2, 2), 128,
                         np.uint8)]
        )
    return yb, cb


def _decode_batch_planar(
    slide: SlideReader,
    chunk: np.ndarray,
    tile_size: int,
    batch_size: int,
    pad_to_batch: bool,
) -> tuple[Any, np.ndarray]:
    """Half-bandwidth planar decode: returns ((Y (B,T,T), CbCr
    (B,T/2,T/2,2)), valid). A chunk the planar path cannot serve (e.g. a
    non-4:2:0 tile later in a slide whose first tile probed fine) falls
    back to the RGB decode — consumers discriminate payloads by type
    (tuple of planes vs a single RGB ndarray)."""
    planes = decode_chunk_planar(
        slide, chunk, tile_size, batch_size if pad_to_batch else None
    )
    if planes is None:
        return _decode_batch(slide, chunk, tile_size, batch_size, pad_to_batch)
    valid = np.ones(len(chunk), dtype=bool)
    if pad_to_batch and len(chunk) < batch_size:
        valid = np.concatenate(
            [valid, np.zeros(batch_size - len(chunk), dtype=bool)]
        )
    return planes, valid


def iter_tile_batches(
    slide: SlideReader,
    coords: np.ndarray,
    tile_size: int,
    batch_size: int,
    pad_to_batch: bool = True,
    prefetch: int = 2,
    planar: bool = False,
):
    """Yield (batch_rgb_u8 (B, T, T, 3), valid_mask (B,)) — or, with
    ``planar=True``, ((Y (B,T,T), CbCr (B,T/2,T/2,2)), valid_mask): raw
    4:2:0 planes at HALF the host→device bytes, finished on device by
    ``ops.jpegcolor.ycbcr420_to_rgb``. Chunks the planar path cannot serve
    (odd coords, a non-4:2:0 tile mid-slide) degrade to the RGB ndarray
    payload — planar consumers must check ``isinstance(payload, tuple)``.

    Host decode runs in a background thread pool ``prefetch`` batches ahead
    of the consumer, so JPEG decode overlaps device compute (the reference
    gets the same overlap from torch DataLoader workers,
    extract_embedding_from_tiles.py:16). Set ``prefetch=0`` for synchronous
    decoding.
    """
    decode = _decode_batch_planar if planar else _decode_batch
    n = len(coords)
    chunks = [coords[s : s + batch_size] for s in range(0, n, batch_size)]
    if prefetch <= 0 or len(chunks) <= 1:
        for chunk in chunks:
            yield decode(slide, chunk, tile_size, batch_size, pad_to_batch)
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=prefetch) as pool:
        futures = [
            pool.submit(decode, slide, c, tile_size, batch_size, pad_to_batch)
            for c in chunks[: prefetch + 1]
        ]
        next_submit = prefetch + 1
        for i in range(len(chunks)):
            tiles, valid = futures[i].result()
            futures[i] = None  # release the decoded stack — retaining every
            # batch across a 100k-tile slide would hold GBs on the host
            if next_submit < len(chunks):
                futures.append(
                    pool.submit(
                        decode, slide, chunks[next_submit], tile_size,
                        batch_size, pad_to_batch,
                    )
                )
                next_submit += 1
            yield tiles, valid
