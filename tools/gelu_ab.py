"""In-situ A/B: seg-forward throughput with exact-erf GELU vs tanh GELU
(monkeypatched at trace time, everywhere — XLA calls in hovernext_fn and
the Pallas kernels' ``_gelu_exact``). The standalone probe
(tools/gelu_probe.py) showed erf costs 1.42x a pure HBM pass while tanh
is bandwidth-hidden; this measures how much of that survives XLA fusion
in the full forward. Run: python tools/gelu_ab.py
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
)
from path_gene_multimodal_tpu.pipeline.nuclei import NucleiModel  # noqa: E402


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
    tiles = jnp.asarray(
        rng.integers(0, 256, (128, 256, 256, 3), dtype=np.uint8)
    )

    seg = NucleiModel.build(HOVERNEXT_TINY, tta=4, dtype=jnp.bfloat16)
    base = _median_sec(lambda: seg._infer(seg.params, tiles))
    print(f"erf GELU : {base*1e3:7.1f} ms  {128/base:7.1f} t/s", flush=True)

    # patch every GELU to tanh BEFORE tracing a fresh model
    import flax.linen as fnn

    from path_gene_multimodal_tpu.models import hovernext_fn as hfn
    from path_gene_multimodal_tpu.ops.pallas import convnext_block as cb
    from path_gene_multimodal_tpu.ops.pallas import decoder as dec

    orig_jax = jax.nn.gelu
    tanh_gelu = lambda x, approximate=True: orig_jax(x, approximate=True)
    jax.nn.gelu = tanh_gelu
    hfn.jax.nn.gelu = tanh_gelu
    cb._gelu_exact = lambda x: orig_jax(x, approximate=True)
    dec._gelu_exact = cb._gelu_exact
    fnn.gelu = tanh_gelu

    seg2 = NucleiModel.build(
        HOVERNEXT_TINY, params=seg.params, tta=4, dtype=jnp.bfloat16
    )
    fast = _median_sec(lambda: seg2._infer(seg2.params, tiles))
    print(f"tanh GELU: {fast*1e3:7.1f} ms  {128/fast:7.1f} t/s", flush=True)
    print(f"saved {(base-fast)*1e3:.1f} ms/b128 ({base/fast:.3f}x)")

    # numeric drift on the actual outputs (bf16 forward)
    a = seg._infer(seg.params, tiles)
    b = seg2._infer(seg2.params, tiles)
    for name, x, y in zip(("np", "hv", "tp"), a, b):
        x, y = np.asarray(x, np.float32), np.asarray(y, np.float32)
        scale = float(np.abs(x).max()) or 1.0
        print(f"max|Δ {name}|/max|{name}| = {np.abs(x-y).max()/scale:.2e}")


if __name__ == "__main__":
    main()
