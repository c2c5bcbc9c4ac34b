"""Benchmark harness — north-star metric: tiles/sec/chip through the full
tile → embed → HoverNeXt → postproc path (BASELINE.md; the reference
publishes no numbers, so vs_baseline is measured against the driver target
of 100k tiles end-to-end in <5 min on v5e-8 = 41.67 tiles/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Runs on whatever backend JAX selects (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

setup_jax()

import numpy as np  # noqa: E402

TARGET_TILES_PER_SEC_PER_CHIP = 100_000 / 300.0 / 8.0  # driver north-star


def _synthetic_hover_maps(rng, b: int, s: int, nuclei: int):
    """NP/HV/type maps with ``nuclei`` disc instances per tile (proper
    centroid-offset HV fields) — a realistic watershed workload."""
    np_prob = np.zeros((b, s, s), np.float32)
    hv = np.zeros((b, s, s, 2), np.float32)
    tp = np.zeros((b, s, s), np.int32)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    for bi in range(b):
        for _ in range(nuclei):
            cy, cx = rng.uniform(8, s - 8, 2)
            r = rng.uniform(4, 9)
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            inside = d2 <= r * r
            np_prob[bi][inside] = 1.0
            hv[bi, :, :, 0][inside] = np.clip((xx[inside] - cx) / r, -1, 1)
            hv[bi, :, :, 1][inside] = np.clip((yy[inside] - cy) / r, -1, 1)
            tp[bi][inside] = int(rng.integers(1, 6))
    return np_prob, hv, tp


def _median_rate(fn, n_items: int, warmup: int = 1, iters: int = 4) -> float:
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return n_items / float(np.median(times))


def _preflight_backend(timeout_s: float = 180.0) -> None:
    """Fail FAST when the accelerator backend is unreachable: a dead axon
    tunnel blocks backend init for ~18 min before raising UNAVAILABLE —
    probe in a subprocess with a bounded wait instead (a live tunnel
    initializes in seconds; compiles are slow, init is not)."""
    import subprocess

    # the probe must resolve platforms exactly like this process (setup_jax
    # honors JAX_PLATFORMS over the sitecustomize re-pin) — a bare
    # `import jax` probe would camp on the axon tunnel even when the parent
    # was told to use CPU
    snippet = (
        f"import sys; sys.path.insert(0, {str(Path(__file__).parent)!r}); "
        "from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax; "
        "setup_jax(); import jax; jax.devices()"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", snippet],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"backend init did not complete within {timeout_s:.0f}s — "
            "accelerator tunnel unreachable; re-run when it is back"
        ) from None
    if proc.returncode != 0:
        raise RuntimeError(
            "backend init failed:\n" + (proc.stderr or proc.stdout)[-2000:]
        )


def main() -> None:
    import tempfile

    _preflight_backend()

    import jax
    import jax.numpy as jnp

    from path_gene_multimodal_tpu.io.slide import synthetic_wsi
    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff
    from path_gene_multimodal_tpu.models.clip import CLIP_VIT_B16, ImageEncoder
    from path_gene_multimodal_tpu.models.hovernext import HOVERNEXT_TINY
    from path_gene_multimodal_tpu.ops.instances import instance_features_batch
    from path_gene_multimodal_tpu.ops.pallas.flood import pallas_supported as _pallas_ok
    from path_gene_multimodal_tpu.pipeline.nuclei import NucleiModel
    from path_gene_multimodal_tpu.pipeline.tessellate import iter_tile_batches

    rng = np.random.default_rng(0)
    SLIDE_PX = 8192  # 36×36 = 1296-tile grid: enough batches for the
    # streamed run to amortize pipeline fill/drain + tunnel RTT (324
    # tiles were 3 batches — fixed costs ate ~40% of the wall clock)
    slide = synthetic_wsi(SLIDE_PX, SLIDE_PX, seed=0, n_blobs=20,
                          nuclei_per_blob=200)

    # --- host tile decode from REAL JPEG TIFF bytes (native C++ decoder) ---
    # materialize the synthetic slide as a real JPEG-compressed tiled SVS so
    # the measured stage is file bytes → decoded RGB batches, the same path
    # tessellation/embedding run in production (ref hot loop: tiling.py:8)
    tiff_dir = tempfile.mkdtemp(prefix="bench_tiff_")
    svs_path = Path(tiff_dir) / "bench.svs"
    write_tiled_tiff(
        svs_path, [slide._levels[0], slide._levels[1]], tile_size=256,
        compression=7, description="Aperio bench |MPP = 0.2500|",
    )
    side = np.arange(0, SLIDE_PX - 224, 224)
    grid = np.stack(
        np.meshgrid(side, side), axis=-1
    ).reshape(-1, 2).astype(np.int64)  # grid-aligned 224px tiles

    def run_decode():
        # fresh reader each iteration: no warm LRU carry-over between runs
        reader = TiffTileSlide(svs_path, cache_tiles=512)
        n = 0
        for tiles, valid in iter_tile_batches(reader, grid, 224, 128,
                                              pad_to_batch=False, prefetch=2):
            n += int(valid.sum())
        assert n == len(grid)

    decode_rate = _median_rate(run_decode, len(grid))
    probe_reader = TiffTileSlide(svs_path)  # capability probes only — one
    # parse of the IFDs instead of a fresh reader per probe
    native_on = probe_reader._native is not None

    # planar host decode (no chroma upsample / color conversion on host —
    # the device finishes those): the host-side cost of the planar feed
    def run_decode_planar():
        reader = TiffTileSlide(svs_path, cache_tiles=512)
        n = 0
        for payload, valid in iter_tile_batches(
            reader, grid, 224, 128, pad_to_batch=False, prefetch=2,
            planar=True,
        ):
            assert isinstance(payload, tuple)  # grid is even → all planar
            n += int(valid.sum())
        assert n == len(grid)

    decode_planar_rate = (
        _median_rate(run_decode_planar, len(grid))
        if probe_reader.supports_planar(0)
        else 0.0
    )

    # stage batch sizes = the pipeline defaults (config.py), which sit at
    # the measured v5e throughput knees
    embed_batch = 512
    tiles224 = np.stack(
        [
            slide.read_region((int(x), int(y)), 0, (224, 224))
            for x, y in rng.integers(0, SLIDE_PX - 224, size=(embed_batch, 2))
        ]
    )
    nuclei_batch = 128
    tiles256 = np.stack(
        [
            slide.read_region((int(x), int(y)), 0, (256, 256))
            for x, y in rng.integers(0, SLIDE_PX - 256, size=(nuclei_batch, 2))
        ]
    )

    # --- embed stage: CLIP ViT-B/16 bf16 (batch = config knee) -------------
    encoder = ImageEncoder(CLIP_VIT_B16, dtype=jnp.bfloat16, seed=0)
    tiles224_dev = jnp.asarray(tiles224)

    def run_embed():
        encoder(tiles224_dev).block_until_ready()

    embed_rate = _median_rate(run_embed, embed_batch)

    # --- nuclei stage: HoverNeXt tiny, TTA×4 forward on real tiles ---------
    seg = NucleiModel.build(HOVERNEXT_TINY, tta=4, dtype=jnp.bfloat16)
    tiles256_dev = jnp.asarray(tiles256)

    def run_seg_fwd():
        out = seg._infer(seg.params, tiles256_dev)
        jax.block_until_ready(out)

    seg_fwd_rate = _median_rate(run_seg_fwd, len(tiles256))

    # --- watershed post-proc + features on REALISTIC maps ------------------
    # random weights produce empty masks (flood exits immediately), which
    # would flatter the number — synthesize ~40 nuclei/tile with proper HV
    # fields instead
    np_prob, hv, tp = _synthetic_hover_maps(rng, b=len(tiles256), s=256, nuclei=40)

    @jax.jit
    def _pp(np_prob, hv, tp):
        lbl = seg._postproc_raw(np_prob, hv)
        feats = instance_features_batch(
            lbl.astype(jnp.int32), tp, max_instances=seg.max_instances,
            use_pallas=_pallas_ok(),
        )
        return feats["area"], feats["centroid_x"], feats["centroid_y"]

    np_prob_d, hv_d, tp_d = jnp.asarray(np_prob), jnp.asarray(hv), jnp.asarray(tp)
    areas, cents_x, cents_y = (np.asarray(a) for a in _pp(np_prob_d, hv_d, tp_d))
    n_found = int((areas > 0).sum())

    def run_pp():
        jax.block_until_ready(_pp(np_prob_d, hv_d, tp_d))

    pp_rate = _median_rate(run_pp, len(tiles256))

    nuclei_rate = 1.0 / (1.0 / seg_fwd_rate + 1.0 / pp_rate)

    # --- graph stage: kNN(k=5) + 40µm radius graph over the pp nuclei ------
    # (north star is tile→embed→nuclei→GRAPH, BASELINE.md:18). Workload:
    # the ~40 nuclei/tile from the postproc stage, in slide coordinates.
    from path_gene_multimodal_tpu.ops.neighbors import combined_graphs

    pts = []
    for bi in range(len(tiles256)):
        live = areas[bi] > 0
        cx = cents_x[bi][live] + (bi % 8) * 256
        cy = cents_y[bi][live] + (bi // 8) * 256
        pts.append(np.stack([cx, cy], axis=1))
    pts = np.concatenate(pts).astype(np.float32)
    radius_px = 40.0 / 0.25  # 40 µm at mpp 0.25 (notebook cells 23-27)

    def run_graph():
        combined_graphs(pts, k=5, radius=radius_px)  # uncapped = reference ball query

    graph_rate = _median_rate(run_graph, len(tiles256))

    # --- combined serial path: decode → embed → nuclei → graph -------------
    combined = 1.0 / (
        1.0 / decode_rate + 1.0 / embed_rate + 1.0 / nuclei_rate + 1.0 / graph_rate
    )

    # --- MEASURED streamed WSI run (one chain, same tile stream) -----------
    # The harmonic composition above assumes zero pipeline overlap; this is
    # the real thing: JPEG bytes → decoded batches → embed + HoverNeXt
    # forward + watershed + instance features per batch (async dispatch
    # overlaps host decode with device compute) → kNN/radius graph over the
    # accumulated nuclei. Because random weights produce empty masks, the
    # watershed consumes the same synthetic 40-nuclei maps as the pp stage,
    # mixed with a 0× term of the real forward outputs so the data
    # dependency (and therefore stage ordering) is preserved while the
    # workload stays realistic.
    stream_batch = nuclei_batch  # the nuclei knee (config) ties the chain

    # planar 4:2:0 device feed: raw Y+CbCr planes over the link (HALF the
    # bytes of RGB), chroma upsample + color conversion on device — the
    # H2D link (PCIe in production; ~25-70 MB/s on the dev tunnel) is the
    # streamed chain's narrowest resource
    from path_gene_multimodal_tpu.ops.jpegcolor import (
        ycbcr420_to_rgb_jit as _planes_to_rgb,  # shared program with the
    )  # pipeline feeds — one compile per plane shape across all consumers

    planar_feed = probe_reader.supports_planar(0)

    @jax.jit
    def _pad224_to_256(tiles_u8):
        # derive the seg window from the SAME uploaded batch on device —
        # one H2D per batch instead of two (uploading both views costs
        # 22 MB/batch; the dev tunnel moves ~25 MB/s, and even on an
        # attached chip one transfer is strictly better)
        return jnp.pad(
            tiles_u8, ((0, 0), (16, 16), (16, 16), (0, 0)), mode="reflect"
        )

    @jax.jit
    def _pp_mixed(np_real, hv_real, syn_np, syn_hv, tp):
        np_mix = syn_np + 0.0 * np_real
        hv_mix = syn_hv + 0.0 * hv_real[..., :2]
        lbl = seg._postproc_raw(np_mix, hv_mix)
        feats = instance_features_batch(
            lbl.astype(jnp.int32), tp, max_instances=seg.max_instances,
            use_pallas=_pallas_ok(),
        )
        # pack instance stats to ONE uint16 tensor on device (areas < 2¹⁶;
        # centroids ×128 → 1/128-px quantization) — the production
        # compact-D2H convention; 6× fewer bytes than three f32 arrays
        return jnp.stack(
            [jnp.clip(feats["area"], 0, 65535),
             feats["centroid_x"] * 128.0,
             feats["centroid_y"] * 128.0], axis=-1,
        ).astype(jnp.uint16)

    def run_streamed() -> tuple[float, int]:
        reader = TiffTileSlide(svs_path, cache_tiles=512)
        t0 = time.perf_counter()
        embs, feats = [], []
        n_tiles = 0
        for tiles, valid in iter_tile_batches(
            reader, grid, 224, stream_batch, pad_to_batch=True, prefetch=2,
            planar=planar_feed,
        ):
            n_tiles += int(valid.sum())
            if isinstance(tiles, tuple):  # planar: half-bandwidth upload,
                tiles_dev = _planes_to_rgb(  # finish decode on device
                    jnp.asarray(tiles[0]), jnp.asarray(tiles[1])
                )
            else:
                tiles_dev = jnp.asarray(tiles)  # ONE async upload per batch
            emb = encoder(tiles_dev)
            np_real, hv_real, _tp = seg._infer(seg.params, _pad224_to_256(tiles_dev))
            f = _pp_mixed(np_real, hv_real, np_prob_d, hv_d, tp_d)
            # start the host copies NOW: they complete behind later
            # batches' compute, so the end-of-run drain only waits for the
            # final batch (jax enqueues the copy after the producing op)
            emb.copy_to_host_async()
            f.copy_to_host_async()
            feats.append(f)
            embs.append(emb)
        # copies already in flight — np.asarray just collects them
        _ = [np.asarray(e) for e in embs]
        acc = np.stack([np.asarray(f) for f in feats])
        a = acc[..., 0]
        cx = acc[..., 1].astype(np.float32) / 128.0
        cy = acc[..., 2].astype(np.float32) / 128.0
        bb, rr, cc = np.nonzero(a > 0)
        g = bb * stream_batch + rr  # GLOBAL tile index spreads the nuclei
        pts_s = np.stack(
            [cx[bb, rr, cc] + (g % 8) * 256, cy[bb, rr, cc] + (g // 8) * 256],
            axis=1,
        ).astype(np.float32)
        combined_graphs(pts_s, k=5, radius=radius_px)
        return time.perf_counter() - t0, n_tiles

    run_streamed()  # warmup: compile every per-batch program
    # best-of-3: the dev tunnel's H2D/D2H bandwidth swings minute-to-minute
    # (measured 7-67 MB/s); min is the least weather-contaminated sample
    runs = [run_streamed() for _ in range(3)]
    wsi_sec = min(sec for sec, _ in runs)
    wsi_tiles = runs[0][1]
    wsi_rate = wsi_tiles / wsi_sec

    print(
        json.dumps(
            {
                "metric": "tiles_per_sec_per_chip_e2e",
                "value": round(combined, 2),
                "unit": "tiles/s/chip (JPEG decode + embed ViT-B/16 bf16 b512 + HoverNeXt tiny TTAx4 b128 + watershed + instance features + kNN/radius graph)",
                "vs_baseline": round(combined / TARGET_TILES_PER_SEC_PER_CHIP, 3),
                "detail": {
                    "decode_tiles_per_sec": round(decode_rate, 2),
                    "decode_planar_tiles_per_sec": round(decode_planar_rate, 2),
                    "native_decoder": native_on,
                    "embed_tiles_per_sec": round(embed_rate, 2),
                    "nuclei_tiles_per_sec": round(nuclei_rate, 2),
                    "seg_forward_tiles_per_sec": round(seg_fwd_rate, 2),
                    "postproc_tiles_per_sec": round(pp_rate, 2),
                    "graph_tiles_per_sec": round(graph_rate, 2),
                    "wsi_e2e_sec": round(wsi_sec, 3),
                    "wsi_tiles": int(wsi_tiles),
                    "wsi_tiles_per_sec": round(wsi_rate, 2),
                    "planar_feed": bool(planar_feed),
                    # north star (BASELINE.md): 100k-tile WSI < 300 s on
                    # v5e-8 — extrapolated from the MEASURED streamed rate
                    # (tile-axis DP scales linearly: zero collectives in
                    # the per-tile chain, stitch/graph are per-shard)
                    "wsi_100k_sec_v5e8_extrapolated": round(
                        100_000 / (8 * wsi_rate), 1
                    ),
                    "graph_nuclei": int(len(pts)),
                    "instances_in_pp_workload": n_found,
                    "target_tiles_per_sec_per_chip": round(TARGET_TILES_PER_SEC_PER_CHIP, 2),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
