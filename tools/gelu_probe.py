"""VPU transcendental cost probe: exact-erf vs tanh vs sigmoid GELU on the
seg final-stage activation shape, generated ON DEVICE (an 8.6 GB host
upload over the dev tunnel would dwarf the measurement). Run:
python tools/gelu_probe.py
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


def _median_sec(fn, warmup=2, iters=5):
    def call():
        float(jnp.sum(fn()))

    for _ in range(warmup):
        call()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        call()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    # the final stage's low-res activation: (B·TTA, 128, 128, 4·cout)
    shape = (512, 128, 128, 256)
    n_el = int(np.prod(shape))
    x = jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(x)

    # baseline: pure HBM pass (read + write, no math) to separate the
    # transcendental cost from the bandwidth floor
    for name, f in (
        ("copy (x+1)", lambda a: a + 1.0),
        ("relu", jax.nn.relu),
        ("gelu tanh", lambda a: jax.nn.gelu(a, approximate=True)),
        ("gelu exact erf", lambda a: jax.nn.gelu(a, approximate=False)),
        ("sigmoid-gelu", lambda a: a * jax.nn.sigmoid(1.702 * a)),
    ):
        fn = jax.jit(f)
        sec = _median_sec(lambda: fn(x))
        gb = 2 * n_el * 2 / 1e9  # bf16 read + write
        print(
            f"{name:16s} {sec*1e3:7.2f} ms  {n_el/sec/1e9:7.1f} Gelem/s  "
            f"{gb/sec:6.0f} GB/s effective",
            flush=True,
        )


if __name__ == "__main__":
    main()
