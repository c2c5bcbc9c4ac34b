"""Nuclei pipeline: batched HoverNeXt inference + watershed + WSI
aggregation.

TPU-native rebuild of the reference's nuclei stack
(``aggregated_hovernet_run.py`` + ``hovernet_inference.py``), fixing its
documented anti-pattern (a full model re-setup per 224-px tile, SURVEY.md
§3.2) — here the model is jitted once and tiles stream through in batches:

1. select TME-ROI tiles from the annotations CSV
   (``select_tiles_for_hovernet`` :51-70);
2. decode each tile, reflect-pad 224→256 (HoverNeXt's input size), batch;
3. one jitted forward (optionally ×4 TTA) → NP/HV/TP maps;
4. ``ops.watershed.hover_instances`` per tile (vmapped) → instance maps;
5. ``ops.instances`` scatter pass → areas/centroids/bboxes/types; host
   marching-squares contours per instance;
6. rows with tile-local AND WSI coordinates (one broadcast add — the
   reference's ``add_wsi_coords_to_nuclei`` :263-336);
7. artifacts: ``<stem>_hovernet_nuclei_wsi.csv`` + ``.parquet``; per-tile
   ``class_inst.json`` ``{inst_id: [type, [0, cx, cy]]}`` and an ``.npz``
   uint32 instance map (replacing the reference's zarr ``pinst_pp.zip`` —
   zarr is not in this environment; the array contract is identical).

TYPE_NAMES parity: {1 neoplastic, 2 inflammatory, 3 connective, 4 dead,
5 epithelial} (``aggregated_hovernet_run.py:76-82``).
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from path_gene_multimodal_tpu.config import TYPE_NAMES, PipelineConfig
from path_gene_multimodal_tpu.core.artifacts import write_nuclei_table
from path_gene_multimodal_tpu.io.slide import SlideReader
from path_gene_multimodal_tpu.models.hovernext import (
    HOVERNEXT_TINY,
    HoverNeXt,
    HoverNeXtConfig,
    hv_rot_invert,
    tta_forward,
)
from path_gene_multimodal_tpu.ops import watershed as ws
from path_gene_multimodal_tpu.ops.jpegcolor import ycbcr420_to_rgb
from path_gene_multimodal_tpu.ops.instances import (
    instance_contours,
    instance_features,
    instance_features_batch,
)
from path_gene_multimodal_tpu.ops.pallas.flood import pallas_supported as _pallas_ok
from path_gene_multimodal_tpu.pipeline.tessellate import decode_chunk_planar
from path_gene_multimodal_tpu.utils.log import get_logger

# single source of truth for the frozen annotations-CSV contract
from path_gene_multimodal_tpu.core.artifacts import (  # noqa: E402
    ANNOTATION_REQUIRED_COLUMNS as REQUIRED_COLUMNS,
)


def load_tile_annotations(csv_path: str | Path) -> pd.DataFrame:
    """Required-column check (aggregated_hovernet_run.py:30-45)."""
    from path_gene_multimodal_tpu.core.artifacts import read_annotations_csv

    return read_annotations_csv(csv_path)


def select_tiles_for_hovernet(df: pd.DataFrame) -> pd.DataFrame:
    """in_tme_roi == True, unique by (x, y), sorted (ref :51-70)."""
    sel = df[df["in_tme_roi"] == True]  # noqa: E712
    sel = sel.drop_duplicates(subset=["x", "y"]).sort_values(["y", "x"])
    return sel.reset_index(drop=True)


@partial(jax.jit, static_argnums=(2, 3))
def _planar_seg_prep(yb, cbcr, pad_lo: int, pad_hi: int):
    """Finish a planar 4:2:0 decode and reflect-pad to the segmentation
    input size, entirely on device (mirrors the host `_pad_tile_to_input`)."""
    rgb = ycbcr420_to_rgb(yb, cbcr)
    return jnp.pad(
        rgb, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)),
        mode="reflect",
    )


class _SegmentedModelMixin:
    """Shared segment surface for the jitted nuclei bundles: ``_infer``
    returns ``(*seg_inputs, tp_cls)`` and ``_postproc(*seg_inputs)``
    returns ``(labels, per-batch overflow count)`` — the mixin owns the
    device_put/dispatch plumbing and the CC slot-overflow accounting."""

    def cc_overflow_tiles(self, reset: bool = False) -> int:
        """Total tiles (across batches dispatched so far) whose component
        count exceeded the Pallas CC slot budget — components beyond it
        were silently dropped (no-silent-caps counter for stage reports)."""
        total = int(sum(int(np.asarray(p).sum()) for p in self._overflow_parts))
        if reset:
            self._overflow_parts.clear()
        return total

    def _note_overflow(self, n_over) -> None:
        self._overflow_parts.append(n_over)
        if len(self._overflow_parts) >= 128:
            # fold to ONE device scalar with lazy adds (no host sync): a
            # long-lived caller that drives segment() directly and never
            # drains the counter must not accumulate live device buffers
            # without bound
            acc = None
            for p in self._overflow_parts:
                s = jnp.sum(jnp.asarray(p).astype(jnp.int32))
                acc = s if acc is None else acc + s
            self._overflow_parts[:] = [acc]

    def segment_async(self, tiles_u8: np.ndarray):
        """Dispatch without materializing: returns device arrays
        (labels uint16 dense, types uint8). jax dispatch is async, so the
        caller can overlap host work with this batch's device compute."""
        if getattr(self, "_mesh", None) is not None:
            from path_gene_multimodal_tpu.parallel.mesh import batch_sharding

            if not isinstance(tiles_u8, jax.Array):
                tiles_u8 = np.asarray(tiles_u8)
            tiles_dev = jax.device_put(tiles_u8, batch_sharding(self._mesh, 4))
        else:
            tiles_dev = jnp.asarray(tiles_u8)
        *seg, tp_cls = self._infer(self.params, tiles_dev)
        lbl, n_over = self._postproc(*seg)
        self._note_overflow(n_over)  # tiny; materialized lazily
        return lbl, tp_cls

    def segment(self, tiles_u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(B, S, S, 3) uint8 → (instance maps (B, S, S) int32 dense labels,
        type maps (B, S, S) int32)."""
        lbl, tp_cls = self.segment_async(tiles_u8)
        return np.asarray(lbl).astype(np.int32), np.asarray(tp_cls).astype(np.int32)


@dataclass
class NucleiModel(_SegmentedModelMixin):
    """Jitted HoverNeXt bundle built once per process."""

    cfg: HoverNeXtConfig
    params: Any
    tta: int = 4
    np_threshold: float = 0.5
    marker_threshold: float = 0.4
    max_instances: int = 512

    @classmethod
    def build(
        cls, cfg: HoverNeXtConfig = HOVERNEXT_TINY, params=None, seed: int = 0,
        dtype=jnp.bfloat16, tta: int = 4, mesh=None, fused: bool | None = None,
        **kw,
    ) -> "NucleiModel":
        """``mesh``: optional ``jax.sharding.Mesh`` — replicates the params
        and shards each window batch over the mesh's tile axis, so WSI
        sliding-window inference data-parallelizes across chips (the
        tile-axis strategy of SURVEY.md §2; window batches must be padded
        to a multiple of the mesh size, which the WSI loop's static batch
        already guarantees)."""
        model = HoverNeXt(cfg, dtype=dtype)
        if params is None:
            dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32)
            params = model.init(jax.random.PRNGKey(seed), dummy)
        if mesh is not None:
            from path_gene_multimodal_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self = cls(cfg=cfg, params=params, tta=tta, **kw)
        self._mesh = mesh

        from path_gene_multimodal_tpu.ops.pallas.flood import pallas_supported

        use_pallas = pallas_supported()
        if fused is None:
            # the fused kernels compute in bf16 internally — do not let a
            # default silently downgrade an explicit f32 model (pass
            # fused=True to override)
            fused = use_pallas and dtype == jnp.bfloat16
        if fused:
            # functional forward with the Pallas fused ConvNeXtV2 block on
            # the encoder hot loop (flax-parity asserted in
            # tests/test_hovernext_fused.py)
            from path_gene_multimodal_tpu.models.hovernext_fn import hovernext_forward

            apply_fn = lambda p, px: hovernext_forward(
                p, px, cfg, dtype=dtype, fused_blocks=True
            )
        else:
            apply_fn = model.apply

        def _infer_body(params, tiles_u8):
            pixels = tiles_u8.astype(jnp.float32) / 255.0
            out = tta_forward(apply_fn, params, pixels, tta=self.tta, fold_batch=True)
            np_prob = jax.nn.softmax(out["np"], axis=-1)[..., 1]
            tp_cls = jnp.argmax(out["tp"], axis=-1).astype(jnp.uint8)  # small D2H
            return np_prob, out["hv"], tp_cls

        def _postproc_body(np_prob, hv):
            lbl, n_over = ws.hover_instances_batch(
                np_prob, hv,
                np_threshold=self.np_threshold,
                marker_threshold=self.marker_threshold,
                use_pallas=use_pallas,
                dense=use_pallas,
                return_overflow=True,
            )
            if use_pallas:
                # the Pallas watershed already flooded dense 1..N ids —
                # just zero the INF background (no compaction gather)
                return jnp.where(lbl < 2**30, lbl, 0).astype(jnp.uint16), n_over
            from path_gene_multimodal_tpu.ops.instances import compact_labels_device

            # dense uint16 labels computed ON DEVICE: kills the per-tile
            # host np.unique pass and halves the D2H bytes
            return compact_labels_device(lbl), n_over

        if mesh is None:
            _infer = jax.jit(_infer_body)
            _postproc = jax.jit(_postproc_body)
        else:
            # per-shard execution via shard_map: every tile is independent,
            # so the forward and postproc run on each chip's local batch
            # shard with ZERO collectives. This also keeps the Pallas
            # kernels (fused blocks, watershed, CC) valid under the mesh —
            # GSPMD cannot partition a custom call and would otherwise
            # all-gather the batch onto every chip.
            from jax.sharding import PartitionSpec as P

            from path_gene_multimodal_tpu.parallel.mesh import TILE_AXIS

            t = P(TILE_AXIS)
            # check_vma=False: varying-axes tracking cannot yet trace
            # Pallas kernel bodies (dynamic_slice on a varying block with
            # scalar starts is rejected); there are no collectives here —
            # every output is fully varying over the tile axis
            _infer = jax.jit(
                jax.shard_map(
                    _infer_body, mesh=mesh, in_specs=(P(), t),
                    out_specs=(t, t, t), check_vma=False,
                )
            )
            _postproc = jax.jit(
                jax.shard_map(
                    _postproc_body, mesh=mesh, in_specs=(t, t), out_specs=(t, t),
                    check_vma=False,
                )
            )

        self._infer = _infer
        self._postproc = _postproc
        # unjitted/unsharded versions for callers that fuse further
        # (bench, WSI mode)
        self._infer_raw = _infer_body
        self._postproc_raw = lambda np_prob, hv: _postproc_body(np_prob, hv)[0]
        # device-side CC slot-overflow counters, one (1,)-or-(n_shards,)
        # array per dispatched batch; summed lazily by cc_overflow_tiles()
        self._overflow_parts: list = []
        return self


@dataclass
class RealNucleiModel(_SegmentedModelMixin):
    """Jitted bundle around the REAL hover_next layout
    (``models.hovernext_real.RealHoverNeXt`` — loaded from a published
    ``pannuke_convnextv2_tiny_3`` checkpoint via
    ``core.checkpoints.load_hovernext_from_torch``). Same duck-typed
    surface as ``NucleiModel`` (``segment_async`` / ``segment`` /
    ``cc_overflow_tiles``), so the per-tile pipeline and the WSI stitcher
    accept either.

    Branch semantics (reconstructed; reference consumer
    ``hovernet_inference.py:150``):

    - the *instance* branch (name containing "inst", else the one with
      3 or 5 channels): 3-channel (bg, interior, border) → seed-growing
      decode (``ops.watershed.threeclass_instances_batch``); 5-channel →
      first 3 as the class triplet + last 2 as HV maps, decoded with the
      hover recipe over the 3-class foreground.
    - the *type* branch: per-pixel (1 + num_types) logits, argmax → type
      id (0 = background), matching TYPE_NAMES directly.
    """

    cfg: Any
    params: Any
    tta: int = 4
    fg_threshold: float = 0.5
    seed_threshold: float = 0.8
    max_instances: int = 512

    @classmethod
    def build(
        cls, cfg, params=None, seed: int = 0, dtype=jnp.bfloat16, tta: int = 4,
        mesh=None, **kw,
    ) -> "RealNucleiModel":
        from path_gene_multimodal_tpu.models.hovernext_real import RealHoverNeXt
        from path_gene_multimodal_tpu.ops.pallas.flood import pallas_supported

        model = RealHoverNeXt(cfg, dtype=dtype)
        if params is None:
            dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32)
            params = model.init(jax.random.PRNGKey(seed), dummy)
        if mesh is not None:
            from path_gene_multimodal_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self = cls(cfg=cfg, params=params, tta=tta, **kw)
        self._mesh = mesh
        use_pallas = pallas_supported()

        inst_head, type_head = _pick_real_branches(cfg)
        inst_ch = dict((h, c) for _, h, c in cfg.branches)[inst_head]

        def _infer_body(params, tiles_u8):
            pixels = tiles_u8.astype(jnp.float32) / 255.0
            out = _tta_forward_real(
                model.apply, params, pixels, tta=self.tta,
                hv_heads={inst_head: (3, 5)} if inst_ch == 5 else {},
            )
            inst_logits = out[inst_head]
            tp_cls = jnp.argmax(out[type_head], axis=-1).astype(jnp.uint8)
            return inst_logits, tp_cls

        def _postproc_body(inst_logits):
            if inst_ch == 5:
                p3 = jax.nn.softmax(inst_logits[..., :3], axis=-1)
                lbl, n_over = ws.hover_instances_batch(
                    p3[..., 1] + p3[..., 2], inst_logits[..., 3:5],
                    np_threshold=self.fg_threshold,
                    use_pallas=use_pallas, dense=use_pallas,
                    return_overflow=True,
                )
            else:
                lbl, n_over = ws.threeclass_instances_batch(
                    inst_logits,
                    fg_threshold=self.fg_threshold,
                    seed_threshold=self.seed_threshold,
                    use_pallas=use_pallas, dense=use_pallas,
                    return_overflow=True,
                )
            if use_pallas:
                return jnp.where(lbl < 2**30, lbl, 0).astype(jnp.uint16), n_over
            from path_gene_multimodal_tpu.ops.instances import compact_labels_device

            return compact_labels_device(lbl), n_over

        if mesh is None:
            self._infer = jax.jit(_infer_body)
            self._postproc = jax.jit(_postproc_body)
        else:
            from jax.sharding import PartitionSpec as P

            from path_gene_multimodal_tpu.parallel.mesh import TILE_AXIS

            t = P(TILE_AXIS)
            self._infer = jax.jit(jax.shard_map(
                _infer_body, mesh=mesh, in_specs=(P(), t), out_specs=(t, t),
                check_vma=False,
            ))
            self._postproc = jax.jit(jax.shard_map(
                _postproc_body, mesh=mesh, in_specs=(t,), out_specs=(t, t),
                check_vma=False,
            ))
        self._overflow_parts: list = []
        return self


def _pick_real_branches(cfg) -> tuple[str, str]:
    """(instance head, type head) from a RealHoverNeXtConfig."""
    heads = [(h, c) for _, h, c in cfg.branches]
    if len(heads) == 1:
        raise ValueError("real hover_next checkpoint has a single branch; "
                         "need instance + type heads")
    inst = [h for h, _ in heads if "inst" in h.lower()]
    if not inst:
        inst = [h for h, c in heads if c in (3, 5)]
    if not inst:
        raise ValueError(f"cannot identify the instance branch among {heads}")
    others = [h for h, _ in heads if h != inst[0]]
    return inst[0], others[0]


def _tta_forward_real(
    apply_fn, params, pixels, tta: int = 4, hv_heads: dict | None = None
):
    """Rotation TTA for dict-output models whose channels are per-pixel
    class maps (rotation-invariant); ``hv_heads`` marks heads whose given
    channel range (lo, hi) holds HV vectors needing the rot-90 swap."""
    hv_heads = hv_heads or {}
    b = pixels.shape[0]
    stacked = jnp.concatenate(
        [jnp.rot90(pixels, k=k, axes=(1, 2)) for k in range(tta)], axis=0
    )
    out = apply_fn(params, stacked)

    def invert(name, t, k):
        t = jnp.rot90(t, k=-k, axes=(1, 2))
        if name in hv_heads:
            lo, hi = hv_heads[name]
            # shared sign/swap table (models/hovernext.py hv_rot_invert) —
            # keeps the real-checkpoint path in lockstep with the canonical
            h, v = hv_rot_invert(t[..., lo], t[..., lo + 1], k)
            t = jnp.concatenate(
                [t[..., :lo], jnp.stack([h, v], axis=-1), t[..., hi:]], axis=-1
            )
        return t

    return {
        name: sum(
            invert(name, full[k * b : (k + 1) * b], k) for k in range(tta)
        ) / tta
        for name, full in out.items()
    }


def _pad_tile_to_input(tile: np.ndarray, input_size: int) -> tuple[np.ndarray, int]:
    """Reflect-pad a (T, T, 3) tile to the model input size; returns
    (padded, offset) where offset is the crop origin to undo."""
    t = tile.shape[0]
    if t == input_size:
        return tile, 0
    pad = (input_size - t) // 2
    out = np.pad(tile, ((pad, input_size - t - pad), (pad, input_size - t - pad), (0, 0)),
                 mode="reflect")
    return out, pad


def run_hovernet_pipeline_on_wsi_tiles(
    slide: SlideReader,
    annotations_csv: str | Path,
    out_dir: str | Path,
    stem: str,
    model: NucleiModel,
    cfg: PipelineConfig,
    batch_size: int | None = None,
    save_tile_artifacts: bool = False,
    write_artifacts: bool = True,
) -> pd.DataFrame:
    """The reference's end-to-end nuclei stage (:342-407) — returns (and
    writes) the WSI-space nuclei table."""
    logger = get_logger()
    # drop any counts a previous (possibly aborted) run left behind — this
    # slide's overflow report must cover exactly this slide's batches
    getattr(model, "cc_overflow_tiles", lambda **_: 0)(reset=True)
    df = load_tile_annotations(annotations_csv)
    sel = select_tiles_for_hovernet(df)
    if len(sel) == 0:
        logger.warning("no TME-ROI tiles for %s; empty nuclei table", stem)
        return _write_empty(out_dir, stem, write_artifacts)

    tile_size = cfg.patch_size
    input_size = model.cfg.input_size
    batch = batch_size or cfg.hovernext.batch_size
    out_dir = Path(out_dir)
    rows: list[dict[str, Any]] = []

    coords = sel[["x", "y"]].to_numpy(np.int64)

    # half-bandwidth planar feed: ship raw 4:2:0 planes, finish decode +
    # reflect-pad to the model input size on device (ops/jpegcolor.py)
    planar = (
        cfg.hovernext.planar_feed
        and tile_size % 2 == 0
        and tile_size <= input_size
        and getattr(model, "_mesh", None) is None
        and getattr(slide, "supports_planar", lambda level=0: False)()
        # odd-coord chunks fall back to RGB inside decode_chunk_planar, so
        # a few odd tiles no longer disqualify the whole slide
    )
    pad_lo = (input_size - tile_size) // 2
    pad_hi = input_size - tile_size - pad_lo

    def _decode_chunk(chunk: np.ndarray):
        if planar:
            planes = decode_chunk_planar(slide, chunk, tile_size, batch)
            if planes is not None:
                return chunk, [pad_lo] * len(chunk), ("planar", *planes)
            # non-4:2:0 / odd region: whole chunk falls back to RGB
        tiles, offsets = [], []
        for x, y in chunk:
            tile = slide.read_region((int(x), int(y)), 0, (tile_size, tile_size))
            padded, off = _pad_tile_to_input(tile, input_size)
            tiles.append(padded)
            offsets.append(off)
        batch_u8 = np.stack(tiles)
        if len(chunk) < batch:  # pad batch to static shape
            batch_u8 = np.concatenate(
                [batch_u8, np.zeros((batch - len(chunk), input_size, input_size, 3), np.uint8)]
            )
        return chunk, offsets, ("rgb", batch_u8)

    capped = {"tiles": 0}  # no-silent-caps: ids ≥ max_instances are dropped
    # by instance_features_batch; count the affected tiles (nuclei_wsi warns
    # for the identical cap)

    # Crop to the tile frame, compute instance features AND a sparse
    # encoding of the label maps ON DEVICE (single-device mode): only the
    # nonzero pixels + live feature slots cross the link, riding behind the
    # batch's compute (the axon tunnel moves ~25 MB/s — a batch of dense
    # maps is seconds of D2H that serializes with the next batch's compute
    # on the device stream). Offsets are uniform in practice (every tile
    # is tile_size → one pad value); a mixed-offset chunk falls back to
    # the dense host path. Mesh mode also falls back: GSPMD cannot
    # partition the Pallas stats custom call.
    feats_on_device = getattr(model, "_mesh", None) is None

    from path_gene_multimodal_tpu.ops.instances import (
        pack_features_sparse,
        pack_labels_sparse,
        unpack_features_sparse,
        unpack_labels_sparse,
    )

    n_px = batch * tile_size * tile_size
    n_slots = batch * model.max_instances
    # budget ladders: start near typical nuclei occupancy, ratchet ×4 when
    # a batch overflows (that batch refetches dense; ≤2 dense batches/slide)
    lbl_budgets = [max(n_px // 32, 4096), n_px // 8, n_px // 2]
    feat_budgets = [max(n_slots // 16, 512), n_slots // 4]
    pack_level = {"lbl": 0, "feat": 0}

    @partial(jax.jit, static_argnames=("off", "lbl_budget", "feat_budget"))
    def _crop_pack_dev(lbl, tp, off: int, lbl_budget: int, feat_budget: int):
        li = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(lbl, off, off + tile_size, axis=1),
            off, off + tile_size, axis=2,
        ).astype(jnp.int32)
        ti = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(tp, off, off + tile_size, axis=1),
            off, off + tile_size, axis=2,
        ).astype(jnp.int32)
        feats = instance_features_batch(
            li, ti, max_instances=model.max_instances,
            use_pallas=_pallas_ok(),
        )
        cnt, idx, ids = pack_labels_sparse(li, lbl_budget)
        fcnt, fidx, fpacked = pack_features_sparse(feats, feat_budget)
        return cnt, idx, ids, fcnt, fidx, fpacked, li, feats

    class _DenseFallback:
        """Keeps the dense device arrays alive (NOT transferred) so an
        overflowing batch can refetch them."""

        __slots__ = ("li", "feats", "lbl_budget", "feat_budget")

        def __init__(self, li, feats, lbl_budget, feat_budget):
            self.li, self.feats = li, feats
            self.lbl_budget, self.feat_budget = lbl_budget, feat_budget

    def _process(chunk, offsets, *rest) -> None:
        # materialize (overlaps with the NEXT batch's device compute)
        if len(rest) == 7:  # sparse path
            cnt, idx, ids, fcnt, fidx, fpacked, fb = rest
            n = int(cnt)
            if n > fb.lbl_budget:  # truncated encoding → dense refetch
                insts = np.asarray(fb.li)[: len(chunk)]
                if pack_level["lbl"] < len(lbl_budgets) - 1:
                    pack_level["lbl"] += 1
            else:
                insts = unpack_labels_sparse(
                    cnt, idx, ids, (batch, tile_size, tile_size)
                )[: len(chunk)]
            if int(fcnt) > fb.feat_budget:
                chunk_feats = {k: np.asarray(v) for k, v in fb.feats.items()}
                if pack_level["feat"] < len(feat_budgets) - 1:
                    pack_level["feat"] += 1
            else:
                chunk_feats = unpack_features_sparse(
                    fcnt, fidx, fpacked, batch, model.max_instances
                )
            typs = None
        else:  # dense path (mesh mode / mixed-offset chunk)
            lbl_dev, tp_dev = rest
            inst_maps = np.asarray(lbl_dev).astype(np.int32)
            type_maps = np.asarray(tp_dev).astype(np.int32)
            insts = np.zeros((len(chunk), tile_size, tile_size), np.int32)
            typs = np.zeros((len(chunk), tile_size, tile_size), np.int32)
            for bi in range(len(chunk)):
                off = offsets[bi]
                insts[bi] = inst_maps[bi, off : off + tile_size, off : off + tile_size]
                typs[bi] = type_maps[bi, off : off + tile_size, off : off + tile_size]
            chunk_feats = {
                k: np.asarray(v)
                for k, v in instance_features_batch(
                    jnp.asarray(insts), jnp.asarray(typs),
                    max_instances=model.max_instances,
                    use_pallas=_pallas_ok(),
                ).items()
            }
        capped["tiles"] += int(
            (insts.max(axis=(1, 2), initial=0) >= model.max_instances).sum()
        )
        for bi, (x, y) in enumerate(chunk):
            feats_bi = {k: v[bi] for k, v in chunk_feats.items()}
            rows.extend(
                _tile_rows(insts[bi], typs[bi] if typs is not None else None,
                           int(x), int(y), out_dir,
                           stem, model.max_instances, save_tile_artifacts, cfg,
                           feats=feats_bi)
            )

    # three-stage software pipeline: threaded decode → async device dispatch
    # → host row-building for batch k while batch k+1 computes on device
    chunks = [coords[s : s + batch] for s in range(0, len(coords), batch)]

    def _step(item):
        chunk, offsets, payload = item
        if payload[0] == "planar":
            batch_u8 = _planar_seg_prep(
                jnp.asarray(payload[1]), jnp.asarray(payload[2]),
                pad_lo, pad_hi,
            )
        else:
            batch_u8 = payload[1]
        # duck-typed models (tests, remote backends) may only offer the
        # synchronous segment()
        dispatch = getattr(model, "segment_async", model.segment)
        lbl_dev, tp_dev = dispatch(batch_u8)
        if not (feats_on_device and len(set(offsets)) == 1):
            return chunk, offsets, lbl_dev, tp_dev
        lb = lbl_budgets[pack_level["lbl"]]
        fbu = feat_budgets[pack_level["feat"]]
        cnt, idx, ids, fcnt, fidx, fpacked, li_dev, feats_dev = _crop_pack_dev(
            lbl_dev, tp_dev, off=int(offsets[0]),
            lbl_budget=lb, feat_budget=fbu,
        )
        # the driver async-copies the top-level sparse arrays; enqueue the
        # dict's arrays here so every transfer rides behind this batch's
        # compute. The full lbl/tp maps and the dense crop stay ON DEVICE
        # (the fallback holder has no copy_to_host_async) — nothing dense
        # crosses the link unless a budget overflows.
        for v in fpacked.values():
            v.copy_to_host_async()
        return (chunk, offsets, cnt, idx, ids, fcnt, fidx, fpacked,
                _DenseFallback(li_dev, feats_dev, lb, fbu))

    pipelined_batches(chunks, _decode_chunk, _step, _process)
    n_over = getattr(model, "cc_overflow_tiles", lambda **_: 0)(reset=True)
    if n_over:
        logger.warning(
            "%s: %d tile(s) exceeded the CC slot budget — components beyond "
            "it were dropped (pathological speckle; raise `big` in "
            "pallas_cc_sizes_adaptive to keep them)", stem, n_over,
        )
    if capped["tiles"]:
        logger.warning(
            "%s: %d tile(s) had instance ids beyond max_instances=%d — "
            "those nuclei were dropped (raise hovernext."
            "max_instances_per_tile to keep them)",
            stem, capped["tiles"], model.max_instances,
        )
    nuclei = pd.DataFrame(rows)
    if len(nuclei) == 0:
        # keep the frozen 30-column schema on EVERY empty path (a
        # column-less frame KeyErrors downstream consumers)
        nuclei = _write_empty(out_dir, stem, write_artifacts)
        nuclei.attrs["cc_slot_overflow_tiles"] = n_over
        return nuclei
    nuclei.attrs["cc_slot_overflow_tiles"] = n_over
    if write_artifacts:
        write_nuclei_table(out_dir / f"{stem}_hovernet_nuclei_wsi", nuclei)
    return nuclei


def pipelined_batches(chunks, decode_fn, step_fn, process_fn, on_batch=None):
    """The shared 3-stage software pipeline driver (per-tile AND WSI
    sliding-window paths — ONE implementation, the two copies had already
    drifted once): threaded decode (2 workers, 3-deep prefetch) →
    ``step_fn(item) -> process_args`` (async device dispatch; device
    outputs get their D2H copies enqueued behind the batch's compute) →
    ``process_fn(*args)`` for batch k while batch k+1 computes."""
    from concurrent.futures import ThreadPoolExecutor

    pending = None
    with ThreadPoolExecutor(max_workers=2) as pool:
        futures = [pool.submit(decode_fn, c) for c in chunks[:3]]
        next_submit = 3
        for i in range(len(chunks)):
            item = futures[i].result()
            futures[i] = None  # release the decoded tile stack — retaining
            # every ~12 MB payload across a large slide holds GBs of host
            # memory
            if next_submit < len(chunks):
                futures.append(pool.submit(decode_fn, chunks[next_submit]))
                next_submit += 1
            args = step_fn(item)
            # enqueue D2H behind this batch's compute — process_fn for
            # batch k then never waits on the transfer while batch k+1
            # computes (jax enqueues the copy after the producing op)
            for t in args:
                if hasattr(t, "copy_to_host_async"):
                    t.copy_to_host_async()
            if pending is not None:
                process_fn(*pending)
            pending = args
            if on_batch is not None:
                on_batch(i, args)
        if pending is not None:
            process_fn(*pending)


def _tile_rows(
    inst: np.ndarray,
    types: np.ndarray | None,  # only consumed when ``feats`` is None
    tile_x: int,
    tile_y: int,
    out_dir: Path,
    stem: str,
    max_instances: int,
    save_tile_artifacts: bool,
    cfg: PipelineConfig,
    feats: dict[str, np.ndarray] | None = None,
) -> list[dict[str, Any]]:
    if feats is None:
        feats = {k: np.asarray(v) for k, v in instance_features(
            jnp.asarray(inst), jnp.asarray(types), max_instances=max_instances
        ).items()}
    contours = instance_contours(inst, feats, simplify_tol=0.5)
    tile_name = f"{tile_x}_{tile_y}"
    rows = []
    class_inst: dict[str, list] = {}
    # iterate LIVE slots only: the slot vector is max_instances wide (512)
    # but a typical window holds a handful of nuclei — scanning every slot
    # with scalar numpy reads costs ~0.5M iterations per slide in the
    # sliding-window mode
    for inst_id in np.flatnonzero(np.asarray(feats["area"]) > 0):
        if inst_id == 0:
            continue
        inst_id = int(inst_id)
        t = int(feats["type"][inst_id])
        cx = float(feats["centroid_x"][inst_id])
        cy = float(feats["centroid_y"][inst_id])
        bbox = [
            float(feats["bbox_xmin"][inst_id]), float(feats["bbox_ymin"][inst_id]),
            float(feats["bbox_xmax"][inst_id]), float(feats["bbox_ymax"][inst_id]),
        ]
        poly = contours.get(inst_id)
        poly_list = poly.tolist() if poly is not None else []
        wsi_poly = (poly + np.array([tile_x, tile_y])).tolist() if poly is not None else []
        # morphology (notebook cells 18-21: regionprops_table + derived)
        perimeter = _ring_length(poly) if poly is not None else 0.0
        solidity = _solidity(poly, float(feats["area"][inst_id])) if poly is not None else 1.0
        rows.append(
            {
                "nuc_id": str(uuid.uuid4()),
                "inst_id": inst_id,
                "type": t,
                "type_name": TYPE_NAMES.get(t, "unknown"),
                "bounding_box": bbox,
                "centroid": [cx, cy],
                "polygon": poly_list,
                "tile_name": tile_name,
                "tile_path": str(out_dir / "patches" / f"{tile_name}.png"),
                "tile_x": tile_x,
                "tile_y": tile_y,
                "centroid_x": cx,
                "centroid_y": cy,
                "wsi_centroid_x": cx + tile_x,
                "wsi_centroid_y": cy + tile_y,
                "bbox_xmin": bbox[0], "bbox_ymin": bbox[1],
                "bbox_xmax": bbox[2], "bbox_ymax": bbox[3],
                "wsi_bbox_xmin": bbox[0] + tile_x, "wsi_bbox_ymin": bbox[1] + tile_y,
                "wsi_bbox_xmax": bbox[2] + tile_x, "wsi_bbox_ymax": bbox[3] + tile_y,
                "wsi_polygon": wsi_poly,
                "area": float(feats["area"][inst_id]),
                "perimeter": perimeter,
                "eccentricity": float(feats["eccentricity"][inst_id]),
                "solidity": solidity,
                "major_axis_length": float(feats["major_axis"][inst_id]),
                "minor_axis_length": float(feats["minor_axis"][inst_id]),
                "orientation": float(feats["orientation"][inst_id]),
            }
        )
        class_inst[str(inst_id)] = [t, [0, cx, cy]]
    if save_tile_artifacts:
        from path_gene_multimodal_tpu.io.zarrzip import write_zarr_zip

        # reference layout: <slide dir>/hovernet_tiles/<tile_stem>/
        # (aggregated_hovernet_run.py:376)
        tdir = out_dir / "hovernet_tiles" / tile_name
        tdir.mkdir(parents=True, exist_ok=True)
        (tdir / "class_inst.json").write_text(json.dumps(class_inst))
        np.savez_compressed(tdir / "pinst_pp.npz", inst_map=inst.astype(np.uint32))
        # the reference consumers' exact contract: zarr zip, (1, H, W) uint32
        # (aggregated_hovernet_run.py:163-166 squeezes the leading axis)
        write_zarr_zip(tdir / "pinst_pp.zip", inst.astype(np.uint32)[None])
    return rows


def _ring_length(poly: np.ndarray) -> float:
    d = np.diff(np.concatenate([poly, poly[:1]], axis=0), axis=0)
    return float(np.sum(np.hypot(d[:, 0], d[:, 1])))


def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain (host; tiny per-nucleus point sets)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out: list[np.ndarray] = []
        for p in seq:
            while len(out) >= 2:
                a, b = out[-1] - out[-2], p - out[-2]
                if a[0] * b[1] - a[1] * b[0] <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _solidity(poly: np.ndarray, area: float) -> float:
    """area / convex-hull area (regionprops solidity)."""
    hull = _convex_hull(poly)
    if len(hull) < 3:
        return 1.0
    x, y = hull[:, 0], hull[:, 1]
    # shoelace via the cross-sum identity: Σ(x·y₊ − x₊·y) = Σ x·y₊ − Σ x₊·y
    # with concatenated rotations (np.roll's axis plumbing costs more than
    # the arithmetic at these ~10-20-vertex hulls, ~10⁴ calls per slide)
    x1 = np.concatenate([x[1:], x[:1]])
    y1 = np.concatenate([y[1:], y[:1]])
    hull_area = 0.5 * abs(np.sum(x * y1 - x1 * y))
    if hull_area <= 0:
        return 1.0
    return float(min(area / hull_area, 1.0))


def _write_empty(out_dir: str | Path, stem: str, write: bool) -> pd.DataFrame:
    empty = pd.DataFrame(
        columns=[
            "nuc_id", "inst_id", "type", "type_name", "bounding_box", "centroid",
            "polygon", "tile_name", "tile_path", "tile_x", "tile_y",
            "centroid_x", "centroid_y", "wsi_centroid_x", "wsi_centroid_y",
            "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax",
            "wsi_bbox_xmin", "wsi_bbox_ymin", "wsi_bbox_xmax", "wsi_bbox_ymax",
            "wsi_polygon", "area", "perimeter", "eccentricity", "solidity",
            "major_axis_length", "minor_axis_length", "orientation",
        ]
    )
    if write:
        write_nuclei_table(Path(out_dir) / f"{stem}_hovernet_nuclei_wsi", empty)
    return empty
