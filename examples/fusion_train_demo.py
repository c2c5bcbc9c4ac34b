"""Multimodal fusion walkthrough — the repo-namesake capability
(BASELINE.json configs[4]: "Multimodal fusion: slide-level embeddings +
gene-expression vectors" over a cohort loop).

Synthesizes a small cohort end-to-end, no external data needed:

1. per-slide tile-embedding matrices (the ``<slide>_features.h5`` payload
   the embedding stage writes) → slide vectors via MIL attention pooling;
2. a genes × samples expression CSV (typical TCGA export layout) →
   ``GeneExpressionTable`` (log1p + z-score);
3. ``FusionHead`` training with the jitted step, mid-run checkpoint +
   bit-exact resume (``core.checkpoints``), and held-out evaluation.

Run from the repo root:
    python examples/fusion_train_demo.py [out_dir]

The synthetic labels depend on BOTH modalities: the printed held-out
accuracy beats the single-modality oracle (~75%), demonstrating true
fusion.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from path_gene_multimodal_tpu.utils.jaxsetup import setup_jax

setup_jax()


def main() -> int:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "fusion_demo_out")
    out_dir.mkdir(parents=True, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from path_gene_multimodal_tpu.core.checkpoints import load_params, save_params
    from path_gene_multimodal_tpu.models.fusion import (
        AttentionPool,
        FusionHead,
        GeneExpressionTable,
        make_fusion_trainer,
    )

    rng = np.random.default_rng(0)
    n_slides, tiles_per_slide, emb_dim, n_genes = 960, 100, 32, 24

    # --- 1. cohort of per-slide tile embeddings → slide vectors -----------
    print(f"[1] {n_slides} slides × {tiles_per_slide} tile embeddings "
          f"→ MIL attention pooling ...")
    slide_signal = rng.normal(size=(n_slides, emb_dim)).astype(np.float32)
    tile_stacks = (
        slide_signal[:, None, :]
        + 0.8 * rng.normal(size=(n_slides, tiles_per_slide, emb_dim)).astype(np.float32)
    )
    pool = AttentionPool(hidden=32)
    pool_params = pool.init(jax.random.PRNGKey(0), jnp.zeros((4, emb_dim)))
    pool_fn = jax.jit(lambda t: pool.apply(pool_params, t))
    slide_vecs = np.stack([np.asarray(pool_fn(jnp.asarray(t))) for t in tile_stacks])

    # --- 2. gene expression table (genes × samples CSV round-trip) --------
    print("[2] genes × samples expression CSV → GeneExpressionTable ...")
    sample_ids = [f"TCGA-{i:03d}" for i in range(n_slides)]
    gene_raw = np.exp(rng.normal(size=(n_genes, n_slides))).astype(np.float32)
    csv_path = out_dir / "expression.csv"
    pd.DataFrame(
        gene_raw, index=[f"GENE{g}" for g in range(n_genes)], columns=sample_ids
    ).to_csv(csv_path)
    table = GeneExpressionTable.from_csv(csv_path)
    genes = np.stack([table.vector_for(s) for s in sample_ids])

    # labels truly need BOTH modalities
    labels = ((slide_signal[:, 0] + genes[:, 0]) > 0).astype(np.int32)

    # --- 3. train/eval split, jitted training, checkpoint + resume --------
    n_train = 720
    print(f"[3] training FusionHead on {n_train} slides, "
          f"evaluating on {n_slides - n_train} ...")
    model = FusionHead(num_outputs=2, proj_dim=16, hidden=16, dropout=0.1)
    state, step, predict = make_fusion_trainer(model, emb_dim, genes.shape[1], 3e-3)
    h_tr, g_tr, y_tr = (jnp.asarray(a[:n_train]) for a in (slide_vecs, genes, labels))
    ckpt = None
    ckpt_state = None
    for epoch in range(120):
        state, loss = step(state, h_tr, g_tr, y_tr)
        if epoch == 60:
            ckpt = save_params(state, out_dir / "fusion_train_state")
            ckpt_state = state  # kept to prove the restore is bit-exact
            print(f"    epoch {epoch}: loss {float(loss):.3f} "
                  f"(checkpoint → {ckpt.name})")
        elif epoch % 40 == 0:
            print(f"    epoch {epoch}: loss {float(loss):.3f}")

    probs = np.asarray(predict(state, jnp.asarray(slide_vecs[n_train:]),
                               jnp.asarray(genes[n_train:])))
    acc = float(((probs[:, 1] > 0.5).astype(int) == labels[n_train:]).mean())
    # single-modality ceiling: the best predictor that ignores genes
    acc_hist = float(((slide_signal[n_train:, 0] > 0).astype(int)
                      == labels[n_train:]).mean())
    print(f"    held-out accuracy: {acc:.2f} "
          f"(hist-only oracle: {acc_hist:.2f} — fusion must beat it)")

    # resume from the mid-run checkpoint: the restore must be BIT-EXACT
    # vs the live epoch-60 state (params + opt state), then train on.
    # `like=state` reuses the in-scope tree structure — no second
    # model/optimizer init whose hyperparameters could silently drift.
    import jax

    restored = load_params(ckpt, like=state)
    bad = sum(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(ckpt_state))
    )
    if bad:
        print(f"FUSION DEMO FAILED: restore not bit-exact ({bad} leaves differ)")
        return 1
    restored, loss = step(restored, h_tr, g_tr, y_tr)
    print(f"[4] resumed from checkpoint (bit-exact restore verified), "
          f"next-step loss {float(loss):.3f}")

    if acc <= acc_hist:  # the stated success criterion: beat the oracle
        print("FUSION DEMO WEAK (no gain over the single-modality oracle)")
        return 1
    print("FUSION DEMO OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
