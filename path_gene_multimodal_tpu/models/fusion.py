"""Multimodal fusion: slide-level histology embeddings × gene expression.

The reference repo's namesake capability (BASELINE.json configs[4]:
"Multimodal fusion: slide-level embeddings + gene-expression vectors" over
the lung-cancer cohort loop; the molecular CSVs from
``pipeline.molecular`` are its per-slide histology side). Components:

- ``slide_embedding``: aggregate (N, D) tile embeddings into one slide
  vector — ``mean`` or gated attention pooling (the standard MIL
  aggregator), jitted;
- ``GeneExpressionTable``: loader/normalizer for genes × samples CSV/TSV
  (log1p + per-gene z-score);
- ``FusionHead``: per-modality projection → concat → MLP → task logits,
  with a jittable training step (optax) that composes with
  ``parallel.train`` mesh sharding for cohort-scale fitting.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd


# ---------------------------------------------------------------------------
# slide-level aggregation
# ---------------------------------------------------------------------------


class AttentionPool(nn.Module):
    """Gated attention MIL pooling (Ilse et al.) over tile embeddings."""

    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tiles: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """tiles (N, D) [+ optional validity mask (N,)] → (D,)."""
        a = nn.tanh(nn.Dense(self.hidden, dtype=self.dtype, name="attn_v")(tiles))
        g = nn.sigmoid(nn.Dense(self.hidden, dtype=self.dtype, name="attn_u")(tiles))
        scores = nn.Dense(1, dtype=self.dtype, name="attn_w")(a * g)[:, 0]
        if mask is not None:
            scores = jnp.where(mask, scores, -jnp.inf)
        weights = jax.nn.softmax(scores)
        if mask is not None:
            # an all-padding bag softmaxes all -inf into NaN — emit a zero
            # embedding instead of poisoning the downstream loss
            weights = jnp.where(jnp.any(mask), weights, 0.0)
        return jnp.sum(weights[:, None] * tiles, axis=0)


def slide_embedding(
    tile_features: np.ndarray, method: str = "mean"
) -> np.ndarray:
    """(N, D) tile features → (D,) slide vector. ``method``: "mean" |
    "max" | "mean_max" (concat)."""
    f = np.asarray(tile_features, np.float32)
    if len(f) == 0:
        raise ValueError("no tile features to aggregate")
    if method == "mean":
        return f.mean(axis=0)
    if method == "max":
        return f.max(axis=0)
    if method == "mean_max":
        return np.concatenate([f.mean(axis=0), f.max(axis=0)])
    raise ValueError(f"unknown aggregation {method!r}")


# ---------------------------------------------------------------------------
# gene expression
# ---------------------------------------------------------------------------


@dataclass
class GeneExpressionTable:
    """genes × samples matrix with normalization."""

    samples: list[str]
    genes: list[str]
    values: np.ndarray  # (num_samples, num_genes) float32, normalized

    @classmethod
    def from_csv(
        cls,
        path: str | Path,
        log1p: bool = True,
        zscore: bool = True,
        sep: str | None = None,
    ) -> "GeneExpressionTable":
        """CSV/TSV with genes as rows and samples as columns (typical TCGA
        export layout; first column = gene id)."""
        path = Path(path)
        if sep is None:
            sep = "\t" if path.suffix.lower() in {".tsv", ".txt"} else ","
        df = pd.read_csv(path, sep=sep, index_col=0)
        genes = [str(g) for g in df.index]
        samples = [str(c) for c in df.columns]
        mat = df.to_numpy(np.float32).T  # (samples, genes)
        if log1p:
            mat = np.log1p(np.maximum(mat, 0.0))
        if zscore:
            mu = mat.mean(axis=0, keepdims=True)
            sd = mat.std(axis=0, keepdims=True)
            mat = (mat - mu) / np.maximum(sd, 1e-8)
        return cls(samples=samples, genes=genes, values=mat)

    def vector_for(self, sample: str) -> np.ndarray:
        try:
            return self.values[self.samples.index(sample)]
        except ValueError:
            raise KeyError(f"sample {sample!r} not in expression table") from None


# ---------------------------------------------------------------------------
# fusion head
# ---------------------------------------------------------------------------


class FusionHead(nn.Module):
    """Histology + expression → task logits."""

    num_outputs: int = 2
    proj_dim: int = 256
    hidden: int = 256
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, slide_emb: jnp.ndarray, gene_expr: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        h = nn.Dense(self.proj_dim, dtype=self.dtype, name="proj_hist")(slide_emb)
        g = nn.Dense(self.proj_dim, dtype=self.dtype, name="proj_gene")(gene_expr)
        x = jnp.concatenate([nn.gelu(h), nn.gelu(g)], axis=-1)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_outputs, dtype=self.dtype, name="fc2")(x)


def make_fusion_trainer(
    model: FusionHead,
    hist_dim: int,
    gene_dim: int,
    learning_rate: float = 1e-3,
    seed: int = 0,
):
    """→ (state, step, predict). ``step(state, hist, genes, labels)`` is one
    jitted SGD step; shard batches with ``parallel.mesh`` for cohort-scale
    fitting."""
    tx = optax.adamw(learning_rate)
    rng = jax.random.PRNGKey(seed)
    params = model.init(
        rng, jnp.zeros((1, hist_dim)), jnp.zeros((1, gene_dim))
    )
    state = {"params": params, "opt": tx.init(params), "rng": rng}

    def loss_fn(params, hist, genes, labels, rng):
        logits = model.apply(params, hist, genes, train=True, rngs={"dropout": rng})
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    @jax.jit
    def step(state, hist, genes, labels):
        rng, sub = jax.random.split(state["rng"])
        loss, grads = jax.value_and_grad(loss_fn)(
            state["params"], hist, genes, labels, sub
        )
        updates, opt = tx.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt": opt, "rng": rng}, loss

    @jax.jit
    def predict(state, hist, genes):
        return jax.nn.softmax(model.apply(state["params"], hist, genes), axis=-1)

    return state, step, predict
