"""ResNet34 (Flax) + the IDaRS molecular-predictor ensemble.

TPU-native rebuild of the reference's TIAToolbox ``PatchPredictor`` path
(``molecular_feature_extraction.py:110-139``): six ``resnet34-idars-*``
torch checkpoints (msi, hm, cin, cimp, braf, tp53 — ``:21-28``), each a
ResNet34 with a 2-class head, run *sequentially with a model reload per
task* in the reference. Here all six run as ONE jitted program: parameters
are stacked on a leading task axis and the forward is ``vmap``-ed over it,
so a tile batch crosses HBM once per sweep instead of six times.

Weight conversion from torchvision-style state_dicts in
``models.weights_resnet`` (BatchNorm folded to inference scale/bias).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: tuple[int, ...] = (3, 4, 6, 3)  # ResNet34
    num_classes: int = 2
    width: int = 64


RESNET34_IDARS = ResNetConfig()


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn2")(y)
        if residual.shape[-1] != self.filters or self.strides != 1:
            residual = nn.Conv(self.filters, (1, 1), strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="down_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype, name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    cfg: ResNetConfig = RESNET34_IDARS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.cfg
        x = nn.Conv(c.width, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for s, blocks in enumerate(c.stage_sizes):
            filters = c.width * (2 ** s)
            for b in range(blocks):
                strides = 2 if (s > 0 and b == 0) else 1
                x = BasicBlock(filters, strides, dtype=self.dtype,
                               name=f"stage{s}_block{b}")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(c.num_classes, dtype=self.dtype, name="fc")(x)


# ImageNet preprocessing (TIAToolbox IDaRS models use torchvision transforms)
# one definition of the ImageNet normalization constants for the whole
# package (models.clip owns them; runner.py imports from there too)
from path_gene_multimodal_tpu.models.clip import (  # noqa: E402
    IMAGENET_MEAN,
    IMAGENET_STD,
)


class IDaRSEnsemble:
    """Six (or N) stacked ResNet34s evaluated in one vmapped forward.

    Pass ``mesh`` (a 1-D tile-axis ``jax.sharding.Mesh``) to run
    data-parallel: the stacked per-task weights replicate onto every device
    and each tile batch shards over the mesh (the same DP pattern as
    ``ImageEncoder``/``NucleiModel``; batches must divide the mesh size —
    ``pipeline.molecular`` always pads to the full batch)."""

    def __init__(
        self,
        tasks: list[str],
        params_per_task: list | None = None,
        cfg: ResNetConfig = RESNET34_IDARS,
        dtype=jnp.bfloat16,
        seed: int = 0,
        mesh=None,
    ):
        self.tasks = list(tasks)
        self.cfg = cfg
        self.mesh = mesh
        self.model = ResNet(cfg, dtype=dtype)
        if params_per_task is None:
            params_per_task = [
                self.model.init(
                    jax.random.PRNGKey(seed + i),
                    jnp.zeros((1, 224, 224, 3), jnp.float32),
                )
                for i in range(len(tasks))
            ]
        if len(params_per_task) != len(tasks):
            raise ValueError("one params tree per task required")
        self.stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs, axis=0), *params_per_task
        )
        if mesh is not None:
            from path_gene_multimodal_tpu.parallel.mesh import (
                batch_sharding,
                shard_params,
            )

            self.stacked = shard_params(self.stacked, mesh)
            self._in_sharding = batch_sharding(mesh, 4)
        else:
            self._in_sharding = None
        apply_fn = self.model.apply
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)

        @jax.jit
        def _fwd(stacked, tiles_u8):
            pixels = (tiles_u8.astype(jnp.float32) / 255.0 - mean) / std
            logits = jax.vmap(lambda p: apply_fn(p, pixels))(stacked)  # (T, B, 2)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return probs[..., 1]  # P(class=1) per task (reference :136)

        self._fwd = _fwd

    def __call__(self, tiles_u8: jnp.ndarray) -> jnp.ndarray:
        """(B, 224, 224, 3) uint8 → (num_tasks, B) float32 probabilities."""
        if self._in_sharding is not None:
            import numpy as _np

            if not isinstance(tiles_u8, jax.Array):
                tiles_u8 = _np.asarray(tiles_u8)
            tiles_u8 = jax.device_put(tiles_u8, self._in_sharding)
        else:
            tiles_u8 = jnp.asarray(tiles_u8)
        return self._fwd(self.stacked, tiles_u8)
