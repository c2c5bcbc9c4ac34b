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


def _median_rate(fn, n_items: int, warmup: int = 1, iters: int = 4) -> float:
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return n_items / float(np.median(times))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from path_gene_multimodal_tpu.io.slide import synthetic_wsi
    from path_gene_multimodal_tpu.models.clip import CLIP_VIT_B16, ImageEncoder
    from path_gene_multimodal_tpu.models.hovernext import HOVERNEXT_TINY
    from path_gene_multimodal_tpu.ops.instances import instance_features_batch
    from path_gene_multimodal_tpu.pipeline.nuclei import NucleiModel

    rng = np.random.default_rng(0)
    slide = synthetic_wsi(4096, 4096, seed=0, n_blobs=5, nuclei_per_blob=200)

    # --- host tile decode (in-memory pyramid; native JPEG measured in CI) --
    embed_batch = 128
    tiles224 = np.stack(
        [
            slide.read_region((int(x), int(y)), 0, (224, 224))
            for x, y in rng.integers(0, 4096 - 224, size=(embed_batch, 2))
        ]
    )
    nuclei_batch = 32
    tiles256 = np.stack(
        [
            slide.read_region((int(x), int(y)), 0, (256, 256))
            for x, y in rng.integers(0, 4096 - 256, size=(nuclei_batch, 2))
        ]
    )

    # --- embed stage: CLIP ViT-B/16 bf16, batch 128 ------------------------
    encoder = ImageEncoder(CLIP_VIT_B16, dtype=jnp.bfloat16, seed=0)
    tiles224_dev = jnp.asarray(tiles224)

    def run_embed():
        encoder(tiles224_dev).block_until_ready()

    embed_rate = _median_rate(run_embed, embed_batch)

    # --- nuclei stage: HoverNeXt tiny, TTA×4, watershed + features ---------
    seg = NucleiModel.build(HOVERNEXT_TINY, tta=4, dtype=jnp.bfloat16)
    tiles256_dev = jnp.asarray(tiles256)

    @jax.jit
    def _full_nuclei(params, t):
        np_prob, hv, tp = seg._infer_raw(params, t)
        lbl = seg._postproc_raw(np_prob, hv)
        feats = instance_features_batch(
            jnp.where(lbl < 2**30, lbl % seg.max_instances, 0), tp,
            max_instances=seg.max_instances,
        )
        return feats["area"]

    def run_nuclei():
        _full_nuclei(seg.params, tiles256_dev).block_until_ready()

    nuclei_rate = _median_rate(run_nuclei, len(tiles256))

    # --- combined serial path ---------------------------------------------
    combined = 1.0 / (1.0 / embed_rate + 1.0 / nuclei_rate)

    print(
        json.dumps(
            {
                "metric": "tiles_per_sec_per_chip_e2e",
                "value": round(combined, 2),
                "unit": "tiles/s/chip (embed ViT-B/16 bf16 b128 + HoverNeXt tiny TTAx4 + watershed + instance features)",
                "vs_baseline": round(combined / TARGET_TILES_PER_SEC_PER_CHIP, 3),
                "detail": {
                    "embed_tiles_per_sec": round(embed_rate, 2),
                    "nuclei_tiles_per_sec": round(nuclei_rate, 2),
                    "target_tiles_per_sec_per_chip": round(TARGET_TILES_PER_SEC_PER_CHIP, 2),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
