"""ConvNeXtV2 parity vs a torch module with the official FCMAE naming
(downsample_layers / stages / dwconv / GRN) — validates the encoder weight
converter for HoverNeXt checkpoints."""

import numpy as np
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.models.convnext import ConvNeXtConfig, ConvNeXtV2
from path_gene_multimodal_tpu.models.weights_convnext import (
    convert_convnextv2,
    infer_convnext_config,
)

torch = pytest.importorskip("torch")


def _torch_convnextv2(torch, depths, dims):
    nn = torch.nn

    class GRN(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.gamma = nn.Parameter(torch.zeros(1, 1, 1, dim))
            self.beta = nn.Parameter(torch.zeros(1, 1, 1, dim))

        def forward(self, x):  # x NHWC
            gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
            nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
            return self.gamma * (x * nx) + self.beta + x

    class Block(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = nn.LayerNorm(dim, eps=1e-6)
            self.pwconv1 = nn.Linear(dim, 4 * dim)
            self.act = nn.GELU()
            self.grn = GRN(4 * dim)
            self.pwconv2 = nn.Linear(4 * dim, dim)

        def forward(self, x):  # NCHW
            inp = x
            x = self.dwconv(x)
            x = x.permute(0, 2, 3, 1)
            x = self.norm(x)
            x = self.pwconv1(x)
            x = self.act(x)
            x = self.grn(x)
            x = self.pwconv2(x)
            x = x.permute(0, 3, 1, 2)
            return inp + x

    class LNChannelsLast(nn.Module):
        """LayerNorm over channels of an NCHW tensor (FCMAE downsample LN)."""

        def __init__(self, dim):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(dim))
            self.bias = nn.Parameter(torch.zeros(dim))

        def forward(self, x):
            x = x.permute(0, 2, 3, 1)
            x = torch.nn.functional.layer_norm(
                x, (x.shape[-1],), self.weight, self.bias, 1e-6
            )
            return x.permute(0, 3, 1, 2)

    class ConvNeXtV2(nn.Module):
        def __init__(self):
            super().__init__()
            self.downsample_layers = nn.ModuleList()
            stem = nn.Sequential(
                nn.Conv2d(3, dims[0], 4, stride=4), LNChannelsLast(dims[0])
            )
            self.downsample_layers.append(stem)
            for i in range(len(dims) - 1):
                self.downsample_layers.append(
                    nn.Sequential(
                        LNChannelsLast(dims[i]),
                        nn.Conv2d(dims[i], dims[i + 1], 2, stride=2),
                    )
                )
            self.stages = nn.ModuleList()
            for i, d in enumerate(dims):
                self.stages.append(
                    nn.Sequential(*[Block(d) for _ in range(depths[i])])
                )

        def forward(self, x):
            feats = []
            for i in range(len(self.stages)):
                x = self.downsample_layers[i](x)
                x = self.stages[i](x)
                feats.append(x)
            return feats

    return ConvNeXtV2()


def test_convnextv2_parity():
    depths, dims = (1, 1, 2, 1), (8, 16, 32, 64)
    torch.manual_seed(0)
    tmodel = _torch_convnextv2(torch, depths, dims).eval()
    sd = tmodel.state_dict()
    cfg = infer_convnext_config(sd)
    assert cfg.depths == depths and cfg.dims == dims
    variables, leftover = convert_convnextv2(sd, cfg)
    assert leftover == {}
    # bit-level parity vs torch's erf GELU; production default is tanh
    # (drift bound pinned in test_hovernext_parity.test_tanh_gelu_drift)
    from dataclasses import replace as dc_replace

    cfg = dc_replace(cfg, exact_gelu=True)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ours = ConvNeXtV2(cfg, dtype=jnp.float32).apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )


def test_prefixed_checkpoint():
    depths, dims = (1, 1), (8, 16)
    torch.manual_seed(1)
    tmodel = _torch_convnextv2(torch, depths, dims).eval()
    sd = {f"encoder.{k}": v for k, v in tmodel.state_dict().items()}
    variables, leftover = convert_convnextv2(sd)
    assert "stem_conv" in variables["params"]
