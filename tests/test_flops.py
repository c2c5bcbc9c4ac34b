"""utils/flops.py analytic counts vs XLA's own cost model.

XLA ``cost_analysis()["flops"]`` counts every dot/conv contraction exactly
(plus a small elementwise surcharge), so on the pure-XLA forward paths the
analytic MAC tally must land just below it — within the elementwise margin.
These goldens run on the CPU backend (tests/conftest.py forces it)."""

import jax
import jax.numpy as jnp
import pytest

from path_gene_multimodal_tpu.models.clip import CLIP_VIT_B16, VIRCHOW2, VisionTower
from path_gene_multimodal_tpu.models.hovernext import HOVERNEXT_TINY, HoverNeXt
from path_gene_multimodal_tpu.models.resnet import RESNET34_IDARS, ResNet
from path_gene_multimodal_tpu.utils import flops as F


def _xla_flops(model, x):
    params = model.init(jax.random.PRNGKey(0), x)
    fn = jax.jit(lambda p, t: model.apply(p, t))
    cost = fn.lower(params, x).compile().cost_analysis()
    return float(cost["flops"])


def _check(analytic_flops: int, xla: float, slack: float):
    # analytic uses the standard conv convention (out_px·k²·cin·cout, padded
    # taps included) while XLA both excludes padded taps AND adds
    # elementwise/transcendental work — the two must agree within ``slack``
    assert analytic_flops <= xla * 1.10, (analytic_flops, xla)
    assert analytic_flops >= xla / (1.0 + slack), (analytic_flops, xla)


def test_hovernext_flops_vs_xla():
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    fc = F.hovernext_flops(HOVERNEXT_TINY)
    # GELU/LN/GRN + the bilinear resize add a few % of elementwise flops
    _check(fc.total_flops, _xla_flops(HoverNeXt(HOVERNEXT_TINY), x), 0.30)
    # sanity on the split: dw is a tiny FLOP fraction but nonzero
    assert 0 < fc.vpu_macs < 0.05 * fc.mxu_macs


def test_hovernext_tta_scales():
    one = F.hovernext_flops(HOVERNEXT_TINY, tta=1)
    four = F.hovernext_flops(HOVERNEXT_TINY, tta=4)
    assert four.total_flops == 4 * one.total_flops
    assert four.by_part["final_conv"] == 4 * one.by_part["final_conv"]


def test_clip_vit_flops_vs_xla():
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    fc = F.vit_flops(CLIP_VIT_B16)
    _check(fc.total_flops, _xla_flops(VisionTower(CLIP_VIT_B16), x), 0.15)


def test_virchow2_flops_vs_xla():
    from path_gene_multimodal_tpu.models.vit_timm import VIRCHOW2_TIMM, TimmViT

    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    fc = F.vit_flops(VIRCHOW2_TIMM)
    _check(fc.total_flops, _xla_flops(TimmViT(VIRCHOW2_TIMM), x), 0.15)
    # the clip.py VIRCHOW2 preset approximates the same scale model
    assert fc.total_flops == pytest.approx(
        F.vit_flops(VIRCHOW2).total_flops, rel=0.12
    )


def test_resnet34_flops_vs_xla():
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    fc = F.resnet_flops(RESNET34_IDARS)
    _check(fc.total_flops, _xla_flops(ResNet(RESNET34_IDARS), x), 0.15)
    # the canonical published figure for ResNet-34 @224 is ~3.6 "GFLOPs",
    # which by the torchvision counting convention is multiply-accumulates
    assert 3.4e9 < fc.mxu_macs < 3.8e9
    assert F.resnet_flops(RESNET34_IDARS, num_models=6).total_flops == (
        6 * fc.total_flops
    )


def test_mfu():
    assert F.mfu(100.0, 1e12, peak_flops=197e12) == pytest.approx(
        100e12 / 197e12
    )
