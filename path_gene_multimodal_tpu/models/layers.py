"""Shared transformer building blocks (Flax linen).

Written TPU-first: weights live in whatever dtype the caller sets
(bf16 for inference), matmuls run on the MXU with f32 accumulation
(``preferred_element_type``), attention uses plain einsum so XLA fuses
QK^T→softmax→V; a Pallas flash-attention path can be swapped in via
``attention_fn`` without touching the module tree.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(a.dtype)


class MultiHeadAttention(nn.Module):
    """Standard MHA with combined bias, matching CLIP/torch semantics."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attention_fn: Callable | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        b, n, d = x.shape
        h = self.num_heads
        hd = d // h
        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        q = dense("q_proj")(x).reshape(b, n, h, hd)
        k = dense("k_proj")(x).reshape(b, n, h, hd)
        v = dense("v_proj")(x).reshape(b, n, h, hd)
        if self.attention_fn is not None:
            out = self.attention_fn(q, k, v, mask)
        else:
            scale = hd ** -0.5
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
            )
            if mask is not None:
                logits = logits + mask
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class TransformerBlock(nn.Module):
    """Pre-LN block: x + attn(ln1(x)); x + mlp(ln2(x))."""

    num_heads: int
    mlp_ratio: float = 4.0
    act: Callable = quick_gelu
    dtype: jnp.dtype = jnp.float32
    attention_fn: Callable | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        x = x + MultiHeadAttention(
            self.num_heads, dtype=self.dtype, attention_fn=self.attention_fn, name="attn"
        )(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = self.act(y)
        y = nn.Dense(d, dtype=self.dtype, name="fc2")(y)
        return x + y


class Transformer(nn.Module):
    layers: int
    num_heads: int
    mlp_ratio: float = 4.0
    act: Callable = quick_gelu
    dtype: jnp.dtype = jnp.float32
    attention_fn: Callable | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        block = TransformerBlock
        if self.remat:
            block = nn.remat(TransformerBlock, static_argnums=())
        for i in range(self.layers):
            x = block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                act=self.act,
                dtype=self.dtype,
                attention_fn=self.attention_fn,
                name=f"block{i}",
            )(x, mask)
        return x
