"""Decompose the seg _infer: forward vs TTA glue vs epilogue (on-chip)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from path_gene_multimodal_tpu.models.hovernext import (  # noqa: E402
    HOVERNEXT_TINY,
    HoverNeXt,
    tta_forward,
)
from path_gene_multimodal_tpu.models import hovernext_fn as hfn  # noqa: E402

CFG = HOVERNEXT_TINY
TTA = 4


def _median_sec(fn, warmup=2, iters=5):
    def call():
        out = fn()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    for _ in range(warmup):
        call()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        call()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8)
    )
    model = HoverNeXt(CFG, dtype=jnp.bfloat16)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    )

    apply_fn = lambda p, px: hfn.hovernext_forward(
        p, px, CFG, dtype=jnp.bfloat16, fused_blocks=True
    )

    views = jax.block_until_ready(
        jnp.concatenate(
            [jnp.rot90(tiles.astype(jnp.float32) / 255.0, k=k, axes=(1, 2))
             for k in range(TTA)]
        )
    )

    def t(name, fn):
        sec = _median_sec(fn)
        print(f"{name:36s} {sec*1e3:8.1f} ms  {batch/sec:8.1f} t/s")

    # raw forward on precomputed stacked views (no rot prep, no inversion)
    fwd = jax.jit(apply_fn)
    t("forward only (4 views stacked)", lambda: fwd(params, views))

    # forward + TTA inversion/mean, no softmax/argmax
    tta_full = jax.jit(
        lambda p, px: tta_forward(apply_fn, p, px, tta=TTA, fold_batch=True)
    )
    pixels = jax.block_until_ready(tiles.astype(jnp.float32) / 255.0)
    t("tta_forward (prep+fwd+invert+mean)", lambda: tta_full(params, pixels))

    # the full production _infer
    def infer(p, tiles_u8):
        px = tiles_u8.astype(jnp.float32) / 255.0
        out = tta_forward(apply_fn, p, px, tta=TTA, fold_batch=True)
        np_prob = jax.nn.softmax(out["np"], axis=-1)[..., 1]
        tp_cls = jnp.argmax(out["tp"], axis=-1).astype(jnp.uint8)
        return np_prob, out["hv"], tp_cls

    inf = jax.jit(infer)
    t("full _infer", lambda: inf(params, tiles))

    # forward with NO final stage (enc+dec only) for reference
    pre = jax.jit(
        lambda p, px: hfn.hovernext_forward(
            p, px, CFG, dtype=jnp.bfloat16, fused_blocks=True,
            return_features=True,
        )
    )
    t("fwd return_features (plain final)", lambda: pre(params, views))


if __name__ == "__main__":
    main()
