"""Stage attribution for the sliding-window WSI mode (bench `wsi_sliding_*`).

Rebuilds the exact bench workload (8192-px synthetic slide as a real JPEG
SVS, head-fitted HoverNeXt tiny, window 256 / stride 248 / batch 128 —
`/root/reference/hovernet_inference.py:173-209` configuration), then runs
`run_hovernext_wsi` twice:

1. with the production overlapped 3-stage driver (the bench number), and
2. with a SERIAL driver swapped in that times each stage independently:
   threaded-decode wait, device dispatch+compute (scalar-readback fenced:
   on the axon tunnel `block_until_ready` can return early), full D2H of
   the maps + feature dict, and the host row-building `_process`.

Prints one JSON line with the overlapped total and the serial per-stage
seconds — the sum exceeds the overlapped total; the max identifies the
pipeline's rate limiter.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

setup_jax()

import numpy as np  # noqa: E402


def main() -> None:
    import shutil

    import jax
    import jax.numpy as jnp  # noqa: F401

    from path_gene_multimodal_tpu.config import default_config
    from path_gene_multimodal_tpu.io.slide import (
        NUCLEUS_TYPE_COLORS,
        synthetic_wsi,
    )
    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff
    from path_gene_multimodal_tpu.models.hovernext import HOVERNEXT_TINY
    from path_gene_multimodal_tpu.pipeline import nuclei as nuclei_mod
    from path_gene_multimodal_tpu.pipeline.nuclei import NucleiModel
    from path_gene_multimodal_tpu.pipeline.nuclei_wsi import run_hovernext_wsi
    from path_gene_multimodal_tpu.utils.headfit import (
        fit_heads,
        sample_tissue_tiles,
    )

    import pickle

    # slide synthesis (~10 min at 8192²) and the head fit dominate setup —
    # cache both across invocations so profiling iterations are minutes,
    # not tens of minutes (cache key: the generator args)
    cache = Path(tempfile.gettempdir()) / "prof_sliding_cache"
    cache.mkdir(exist_ok=True)
    svs_path = cache / "bench.svs"
    fit_path = cache / "fitted.pkl"
    if not svs_path.exists():
        t0 = time.perf_counter()
        slide = synthetic_wsi(8192, 8192, seed=0, n_blobs=20,
                              nuclei_per_blob=600,
                              nucleus_colors=NUCLEUS_TYPE_COLORS)
        write_tiled_tiff(svs_path, [slide._levels[0], slide._levels[1]],
                         tile_size=256, compression=7,
                         description="Aperio bench |MPP = 0.2500|")
        print(f"# slide written in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
    else:
        slide = None
        print("# slide cached", file=sys.stderr)

    if not fit_path.exists():
        if slide is None:
            from path_gene_multimodal_tpu.io.slide import open_slide

            slide = open_slide(svs_path)
        seg0 = NucleiModel.build(HOVERNEXT_TINY, tta=4, dtype=jnp.bfloat16)
        fit_tiles = sample_tissue_tiles(slide, 8, 256, seed=5, max_tries=1600,
                                        nucleus_colors=NUCLEUS_TYPE_COLORS)
        t0 = time.perf_counter()
        fitted = fit_heads(HOVERNEXT_TINY, seg0.params, fit_tiles,
                           nucleus_colors=NUCLEUS_TYPE_COLORS)
        print(f"# heads fit in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        fit_path.write_bytes(
            pickle.dumps(jax.tree_util.tree_map(np.asarray, fitted))
        )
    else:
        fitted = pickle.loads(fit_path.read_bytes())
        print("# heads cached", file=sys.stderr)
    seg = NucleiModel.build(HOVERNEXT_TINY, params=fitted, tta=4,
                            dtype=jnp.bfloat16)

    cfg = default_config()
    out = {}

    def one_run(tag: str) -> float:
        sdir = Path(tempfile.mkdtemp(prefix=f"prof_{tag}_"))
        t0 = time.perf_counter()
        _, nuc = run_hovernext_wsi(
            TiffTileSlide(svs_path, cache_tiles=512), sdir, tag, seg, cfg
        )
        dt = time.perf_counter() - t0
        shutil.rmtree(sdir, ignore_errors=True)
        out[f"{tag}_nuclei"] = len(nuc)
        return dt

    one_run("warm")  # compile + cache warm
    out["overlapped_sec"] = round(one_run("timed"), 3)

    # --- serial driver with per-stage timers ------------------------------
    # PROF_CPROFILE=1 additionally cProfiles the host process stage and
    # prints its top functions to stderr
    import cProfile
    import os
    import pstats

    prof = cProfile.Profile() if os.environ.get("PROF_CPROFILE") else None
    stages = {"decode": 0.0, "device": 0.0, "d2h": 0.0, "process": 0.0}
    n_batches = [0]

    def serial_driver(chunks, decode_fn, step_fn, process_fn, on_batch=None):
        pc = time.perf_counter
        for c in chunks:
            n_batches[0] += 1
            t = pc(); item = decode_fn(c); stages["decode"] += pc() - t
            t = pc()
            args = step_fn(item)
            # fence device compute with a scalar readback (tunnel
            # block_until_ready can return early)
            for a in args:
                if hasattr(a, "copy_to_host_async"):
                    np.asarray(a.ravel()[0])
            stages["device"] += pc() - t
            t = pc()
            new_args = []
            for a in args:
                if hasattr(a, "copy_to_host_async"):
                    new_args.append(np.asarray(a))
                elif isinstance(a, dict):
                    new_args.append({k: np.asarray(v) for k, v in a.items()})
                else:
                    new_args.append(a)
            stages["d2h"] += pc() - t
            t = pc()
            if prof is not None:
                prof.enable()
            process_fn(*new_args)
            if prof is not None:
                prof.disable()
            stages["process"] += pc() - t

    orig = nuclei_mod.pipelined_batches
    nuclei_mod.pipelined_batches = serial_driver
    try:
        out["serial_total_sec"] = round(one_run("serial"), 3)
    finally:
        nuclei_mod.pipelined_batches = orig

    if prof is not None:
        pstats.Stats(prof, stream=sys.stderr).sort_stats("tottime").print_stats(18)
    out["serial_stages_sec"] = {k: round(v, 3) for k, v in stages.items()}
    out["n_batches"] = n_batches[0]
    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
