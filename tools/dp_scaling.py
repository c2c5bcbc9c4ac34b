"""Measured evidence for the tile-axis DP scaling claim (bench.py's
``wsi_100k_sec_v5e8_extrapolated``).

Real multi-chip hardware is not reachable from this environment (one
v5e chip over a tunnel), so the claim "per-tile DP scales linearly"
is validated the way it CAN be validated here, on an 8-virtual-device
CPU mesh running the SAME production wrappers (``ImageEncoder``,
``NucleiModel`` — models.clip / pipeline.nuclei):

1. **Collective audit**: compile the per-tile chain (embed forward, seg
   infer, watershed postproc + instance features) on a 1-device and an
   8-device mesh and count every collective op in the optimized HLO
   (all-reduce / all-gather / reduce-scatter / collective-permute /
   all-to-all). Zero collectives on the 8-device mesh = each device's
   shard is compiler-provably independent, so chip-count scaling is
   limited only by the host feed, not by communication.
2. **Per-device work partition**: XLA's post-compile cost analysis on
   the 8-device program must show ~1/8 the FLOPs of the 1-device program
   at the same global batch — no redundant/replicated compute.
3. **Strong-scaling wall time on one core**: this host has ONE CPU core,
   so 8 virtual devices cannot run concurrently — but that makes total
   wall time a direct probe of overhead: at fixed global batch, the
   8-way-sharded program should take ≈ the 1-device time (same total
   work, zero comm). Any sharding tax would show up as a ratio > 1.

Run (forces the CPU backend + 8 virtual devices):

    python tools/dp_scaling.py [out.json]

Prints one JSON object; bench.py embeds it in the detail block.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


def _count_collectives(hlo_text: str) -> dict[str, int]:
    out = {}
    for op in COLLECTIVES:
        # count op DEFINITIONS ("  %all-reduce.1 = ..." or " = ...
        # all-reduce(") rather than raw substrings, which would also hit
        # metadata/backend-config echoes
        n = sum(
            1
            for line in hlo_text.splitlines()
            if f" {op}(" in line or f"%{op}" in line.split("=")[0]
        )
        if n:
            out[op] = n
    return out


def _median_sec(fn, warmup=1, iters=3):
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
    from path_gene_multimodal_tpu.models.clip import ImageEncoder, VisionConfig
    from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig
    from path_gene_multimodal_tpu.models.hovernext import HoverNeXtConfig
    from path_gene_multimodal_tpu.parallel.mesh import make_mesh
    from path_gene_multimodal_tpu.pipeline.nuclei import NucleiModel

    assert len(jax.devices()) >= 8, jax.devices()

    # small widths (CPU host), production code paths: the collective
    # structure depends on the sharding specs and program shape, not on
    # channel widths
    vis = VisionConfig(image_size=64, patch_size=16, width=64, layers=2,
                       heads=2, out_dim=32)
    seg_cfg = HoverNeXtConfig(
        encoder=ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(8, 16, 24, 32)),
        decoder_dims=(24, 16, 8, 8),
        input_size=64,
    )
    GLOBAL_BATCH = 16
    rng = np.random.default_rng(0)
    tiles64 = rng.integers(0, 256, (GLOBAL_BATCH, 64, 64, 3), dtype=np.uint8)

    result: dict = {
        "global_batch": GLOBAL_BATCH,
        "host_cores": os.cpu_count(),
        "per_mesh": {},
    }

    for n in (1, 8):
        mesh = make_mesh(n)
        enc = ImageEncoder(vis, dtype=jnp.float32, seed=0, mesh=mesh)
        seg = NucleiModel.build(seg_cfg, tta=4, dtype=jnp.float32, mesh=mesh)

        # --- compile + audit each jitted program of the per-tile chain ---
        hlos: dict[str, str] = {}
        flops: dict[str, float] = {}

        placed = jax.device_put(
            tiles64,
            enc._in_sharding if enc._in_sharding is not None else jax.devices()[0],
        )
        lowered = enc._fwd.lower(enc.params, placed)
        comp = lowered.compile()
        hlos["embed"] = comp.as_text()
        ca = comp.cost_analysis()
        flops["embed"] = float((ca[0] if isinstance(ca, (list, tuple)) else ca).get("flops", -1))

        if getattr(seg, "_mesh", None) is not None:
            from path_gene_multimodal_tpu.parallel.mesh import batch_sharding

            seg_placed = jax.device_put(
                jnp.asarray(tiles64), batch_sharding(seg._mesh, 4)
            )
        else:
            seg_placed = jax.device_put(jnp.asarray(tiles64), jax.devices()[0])
        lowered = seg._infer.lower(seg.params, seg_placed)
        comp_seg = lowered.compile()
        hlos["seg_infer"] = comp_seg.as_text()
        ca = comp_seg.cost_analysis()
        flops["seg_infer"] = float((ca[0] if isinstance(ca, (list, tuple)) else ca).get("flops", -1))

        coll = {
            stage: _count_collectives(text) for stage, text in hlos.items()
        }

        # --- wall time at the same GLOBAL batch (strong scaling) ----------
        def run_chain():
            e = enc(tiles64)
            s = seg._infer(seg.params, seg_placed)
            return (e, s[0])

        sec = _median_sec(run_chain)

        result["per_mesh"][str(n)] = {
            "collectives": coll,
            "total_collective_ops": int(
                sum(sum(c.values()) for c in coll.values())
            ),
            "per_device_flops": flops,
            "chain_sec_global_batch": round(sec, 4),
        }

    r1 = result["per_mesh"]["1"]
    r8 = result["per_mesh"]["8"]
    result["flops_partition_ratio"] = {
        k: round(r8["per_device_flops"][k] / r1["per_device_flops"][k], 4)
        for k in r1["per_device_flops"]
        if r1["per_device_flops"][k] > 0
    }
    result["walltime_ratio_8dev_vs_1dev"] = round(
        r8["chain_sec_global_batch"] / r1["chain_sec_global_batch"], 3
    )
    result["verdict"] = (
        "zero collectives in the per-tile chain"
        if r8["total_collective_ops"] == 0
        else f"{r8['total_collective_ops']} collective ops found"
    )

    text = json.dumps(result, indent=1)
    print(text)
    if len(sys.argv) > 1:
        Path(sys.argv[1]).write_text(text)


if __name__ == "__main__":
    main()
