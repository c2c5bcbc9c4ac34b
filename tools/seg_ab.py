"""On-chip A/B probes for the seg-forward stage (scratch tool).

Sizes the remaining levers named by the round-4 review: encoder
fused-vs-XLA blocks, batch knee, and the exact-erf GELU cost in the
final stage. Run: python tools/seg_ab.py
"""

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
    rng = np.random.default_rng(0)
    model = HoverNeXt(CFG, dtype=jnp.bfloat16)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    )

    def make_infer(fused_blocks, batch):
        tiles = jnp.asarray(
            rng.integers(0, 256, (batch, 256, 256, 3), dtype=np.uint8)
        )
        apply_fn = lambda p, px: hfn.hovernext_forward(
            p, px, CFG, dtype=jnp.bfloat16, fused_blocks=fused_blocks
        )

        def infer(p, tiles_u8):
            px = tiles_u8.astype(jnp.float32) / 255.0
            out = tta_forward(apply_fn, p, px, tta=TTA, fold_batch=True)
            np_prob = jax.nn.softmax(out["np"], axis=-1)[..., 1]
            tp_cls = jnp.argmax(out["tp"], axis=-1).astype(jnp.uint8)
            return np_prob, out["hv"], tp_cls

        fn = jax.jit(infer)
        return lambda: fn(params, tiles), batch

    for fused_blocks in (True, False):
        for batch in (128, 256):
            fn, b = make_infer(fused_blocks, batch)
            sec = _median_sec(fn)
            print(
                f"infer fused_blocks={fused_blocks!s:5} b={b:3d}: "
                f"{sec*1e3:7.1f} ms  {b/sec:7.1f} t/s", flush=True,
            )

    # GELU-cost probe: the final stage's (512, 128, 128, 256) bf16 map.
    x = jnp.asarray(
        rng.standard_normal((512, 128, 128, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    for name, f in (
        ("gelu exact (erf)", lambda a: jax.nn.gelu(a, approximate=False)),
        ("gelu tanh", lambda a: jax.nn.gelu(a, approximate=True)),
        ("sigmoid-gelu", lambda a: a * jax.nn.sigmoid(1.702 * a)),
        ("relu (floor)", jax.nn.relu),
    ):
        fn = jax.jit(f)
        sec = _median_sec(lambda: fn(x))
        print(f"{name:18s} on (512,128,128,256): {sec*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
