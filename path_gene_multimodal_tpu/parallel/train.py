"""Data-parallel training step (linear probe / fine-tune head).

The reference never trains (external pretrained weights only, SURVEY.md
§5), but the framework ships a supervised tile-classifier training path —
a linear probe (or full fine-tune) of the tile encoder against the 5-class
labels — because that's the natural next step users take with the
reference's outputs. The step is a plain jitted function over mesh-sharded
batches: XLA inserts the gradient psum across the tile axis automatically
from the shardings (scaling-book recipe: annotate shardings, let the
compiler place collectives).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from path_gene_multimodal_tpu.parallel.mesh import batch_sharding, replicate


def make_linear_probe_step(
    encoder_apply: Callable,
    encoder_params: Any,
    feature_dim: int,
    num_classes: int,
    learning_rate: float = 1e-3,
    train_encoder: bool = False,
):
    """Returns (init_state, step_fn(state, pixels, labels) → (state, loss)).

    ``train_encoder=False`` freezes the tower (linear probe); gradients
    then flow only to the head, and the frozen forward can run in bf16.
    """
    tx = optax.adamw(learning_rate)

    def init_state(rng: jax.Array):
        head = {
            "w": jax.random.normal(rng, (feature_dim, num_classes)) * 0.02,
            "b": jnp.zeros((num_classes,)),
        }
        params = {"head": head}
        if train_encoder:
            params["encoder"] = encoder_params
        return {"params": params, "opt": tx.init(params)}

    def loss_fn(params, pixels, labels):
        enc_params = params.get("encoder", encoder_params)
        feats = encoder_apply(enc_params, pixels)
        logits = feats @ params["head"]["w"] + params["head"]["b"]
        ll = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return ll.mean()

    @jax.jit
    def step(state, pixels, labels):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], pixels, labels)
        updates, opt = tx.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt": opt}, loss

    return init_state, step


def shard_step_over_mesh(step, mesh, state):
    """Place state replicated + batches sharded; returns a wrapped step
    that accepts host arrays and keeps everything on-mesh. Works for any
    step arity — (pixels, labels) for the linear probe, (hist, genes,
    labels) for the fusion trainer — every batch arg shards on its
    leading axis."""
    rep = replicate(mesh)
    state = jax.device_put(state, rep)

    def run(state, *batches):
        placed = (
            jax.device_put(b, batch_sharding(mesh, jnp.ndim(b))) for b in batches
        )
        return step(state, *placed)

    return run, state
