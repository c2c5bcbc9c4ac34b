"""On-chip seg-forward stage profile + final-stage A/B.

Times the production HoverNeXt TTA×4 forward (the nuclei-stage hot loop,
reference workload ``hovernet_inference.py:188-206``) at the config batch
knee, split by stage (encoder / decoder / final+heads / TTA glue), for
each final-stage formulation, and prints tiles/s plus MFU from the
analytic FLOP counts (``utils.flops``). Run on the real chip:

    python tools/seg_profile.py [batch]
"""

from __future__ import annotations

import json
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
from path_gene_multimodal_tpu.utils import flops as F  # noqa: E402

CFG = HOVERNEXT_TINY
TTA = 4


def _median_sec(fn, warmup=2, iters=5):
    def call():
        out = fn()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # force completion

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
        rng.integers(0, 256, size=(batch, CFG.input_size, CFG.input_size, 3),
                     dtype=np.uint8)
    )
    model = HoverNeXt(CFG, dtype=jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, CFG.input_size, CFG.input_size, 3), jnp.float32),
    )
    params = jax.device_put(params)

    fc = F.hovernext_flops(CFG, tta=TTA)
    flops_tile = fc.total_flops
    print(f"batch={batch} tta={TTA} backend={jax.default_backend()}")
    print(
        f"analytic per tile: {flops_tile/1e9:.1f} GFLOP "
        f"(MXU {fc.mxu_flops/1e9:.1f}, dw-VPU {fc.vpu_flops/1e9:.1f})"
    )

    results: dict[str, float] = {}

    def report(name: str, sec: float, n_tiles: int, flops=None):
        rate = n_tiles / sec
        line = f"{name:28s} {sec*1e3:8.1f} ms  {rate:8.1f} t/s"
        if flops:
            line += f"  MFU {F.mfu(rate, flops):.3f}"
        print(line)
        results[name] = round(rate, 2)

    # --- full production-style _infer per final variant -------------------
    def make_infer(fused_final):
        def body(p, tiles_u8):
            pixels = tiles_u8.astype(jnp.float32) / 255.0
            apply_fn = lambda pp, px: hfn.hovernext_forward(
                pp, px, CFG, dtype=jnp.bfloat16, fused_blocks=True,
                fused_final=fused_final,
            )
            out = tta_forward(apply_fn, p, pixels, tta=TTA, fold_batch=True)
            np_prob = jax.nn.softmax(out["np"], axis=-1)[..., 1]
            tp_cls = jnp.argmax(out["tp"], axis=-1).astype(jnp.uint8)
            return np_prob, out["hv"], tp_cls

        return jax.jit(body)

    for variant in ("lowres", "pallas"):
        fn = make_infer(variant)
        sec = _median_sec(lambda: fn(params, tiles))
        report(f"infer[{variant}]", sec, batch, flops_tile)

    # --- stage slices (lowres default path) --------------------------------
    views = jnp.concatenate(
        [jnp.rot90(tiles.astype(jnp.float32) / 255.0, k=k, axes=(1, 2))
         for k in range(TTA)]
    ).astype(jnp.bfloat16)

    p = params["params"]
    enc_fn = jax.jit(
        lambda pp, px: hfn.encoder_features(
            pp["encoder"], px, CFG, jnp.bfloat16, True
        )[-1]
    )
    sec_enc = _median_sec(lambda: enc_fn(p, views))
    report("encoder (4 views/tile)", sec_enc, batch,
           2 * (fc.by_part.get("stem", 0)
                + sum(v for k, v in fc.by_part.items() if k.startswith(("enc_", "down")))))

    def prefinal(pp, px):
        feats = hfn.encoder_features(pp["encoder"], px, CFG, jnp.bfloat16, True)
        x = feats[-1]
        skips = [feats[2], feats[1], feats[0], None]
        for i in range(len(CFG.decoder_dims)):
            dp = pp[f"dec{i}"]
            x = hfn._upsample2x_nearest(x)
            if skips[i] is not None:
                x = jnp.concatenate([x, skips[i]], axis=-1)
            for j in range(2):
                x = hfn._conv(dp[f"conv{j}"], x, stride=1, pad=1,
                              dtype=jnp.bfloat16)
                x = hfn._ln(dp[f"norm{j}"], x, jnp.bfloat16)
                x = jax.nn.gelu(x, approximate=False)
        return x

    pre_fn = jax.jit(prefinal)
    sec_pre = _median_sec(lambda: pre_fn(p, views))
    report("enc+decoder", sec_pre, batch)

    xdec = jax.block_until_ready(pre_fn(p, views))
    for name, fn in (
        ("final lowres (XLA)",
         jax.jit(lambda pp, xx: hfn._final_heads_lowres(pp, xx, jnp.bfloat16))),
        ("final pallas kernel",
         jax.jit(lambda pp, xx: hfn._final_heads_lowres_pallas(pp, xx, jnp.bfloat16))),
    ):
        sec = _median_sec(lambda: fn(p, xdec))
        # fc is already TTA-scaled; per-tile final-stage FLOPs
        report(name, sec, batch,
               2 * (fc.by_part["final_conv"] + fc.by_part["heads"]))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
