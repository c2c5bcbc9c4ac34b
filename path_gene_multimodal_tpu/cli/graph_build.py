"""Cell-graph construction + stage-6 analysis CLI.

The reference leaves README stages 5-6 in notebooks
(``hovernet_tile_inference.ipynb`` cells 11-27; SURVEY.md §2 C20) — there
is no script entry for "nuclei table in, spatial graph + analysis out".
This CLI completes that surface: it reads the WSI nuclei table the nuclei
pipeline wrote (``<stem>_hovernet_nuclei_wsi.parquet``/``.csv``), builds
the kNN + radius graphs (``pipeline.graph``), and runs the stage-6
analysis (``pipeline.graph_stats``).

Outputs: ``<stem>_cell_graph.npz``, ``<stem>_graph_stats.json``,
``<stem>_graph_node_stats.npz``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from path_gene_multimodal_tpu.utils.log import get_logger


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nuclei", required=True,
                    help="nuclei table (.parquet or .csv) from the nuclei pipeline")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--stem", default=None,
                    help="artifact stem (default: nuclei filename stem "
                         "without the _hovernet_nuclei_wsi suffix)")
    ap.add_argument("--knn-k", type=int, default=None)
    ap.add_argument("--radius-um", type=float, default=None)
    ap.add_argument("--mpp", type=float, default=None)
    ap.add_argument("--type-filter", type=int, nargs="*", default=None,
                    help="restrict to these type ids (e.g. 1 2 = "
                         "neoplastic+inflammatory, notebook cell 12)")
    ap.add_argument("--n-perms", type=int, default=200,
                    help="permutations for interaction z-scores (0 = skip)")
    args = ap.parse_args(argv)

    from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    logger = get_logger()

    import pandas as pd

    from path_gene_multimodal_tpu.config import default_config
    from path_gene_multimodal_tpu.pipeline.graph import build_cell_graph
    from path_gene_multimodal_tpu.pipeline.graph_stats import analyze_graph

    nuclei_path = Path(args.nuclei)
    if not nuclei_path.exists():
        logger.error("nuclei table not found: %s", nuclei_path)
        return 2
    if nuclei_path.suffix == ".parquet":
        nuclei = pd.read_parquet(nuclei_path)
    else:
        nuclei = pd.read_csv(nuclei_path)
    if len(nuclei) == 0:
        logger.error("nuclei table is empty: %s", nuclei_path)
        return 2

    stem = args.stem or nuclei_path.stem.removesuffix("_hovernet_nuclei_wsi")
    import dataclasses

    cfg = default_config().graph
    overrides = {
        k: v
        for k, v in (("knn_k", args.knn_k), ("radius_um", args.radius_um),
                     ("mpp", args.mpp))
        if v is not None
    }
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    out_dir = Path(args.output)
    try:
        graph = build_cell_graph(
            nuclei, cfg, out_dir, stem,
            type_filter=args.type_filter if args.type_filter else None,
        )
    except ValueError as e:
        # e.g. --type-filter matched no rows — same clean exit contract as
        # the missing/empty-input paths, not a traceback
        logger.error("cannot build graph: %s", e)
        return 2
    summary = analyze_graph(graph, out_dir, stem, n_perms=args.n_perms)
    logger.info(
        "graph CLI done: %d nodes, %d edges, mean degree %.2f → %s",
        summary["n_nodes"], summary["n_edges"], summary["mean_degree"],
        out_dir,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
