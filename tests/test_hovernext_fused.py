"""Functional HoverNeXt forward + fused Pallas ConvNeXt block parity.

Golden: the Flax modules themselves (``models.hovernext`` /
``models.convnext``) — the functional path must reproduce them so the
fused kernel can be swapped into production inference safely.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from path_gene_multimodal_tpu.models.convnext import ConvNeXtBlock, ConvNeXtConfig
from path_gene_multimodal_tpu.models.hovernext import HoverNeXt, HoverNeXtConfig
from path_gene_multimodal_tpu.models.hovernext_fn import (
    encoder_features,
    hovernext_forward,
)
from path_gene_multimodal_tpu.ops.pallas.convnext_block import (
    block_params_from_flax,
    fused_convnext_block,
)

SMALL = HoverNeXtConfig(
    encoder=ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(8, 16, 24, 32)),
    decoder_dims=(24, 16, 8, 8),
    input_size=64,
)


@pytest.fixture(scope="module")
def small_model():
    model = HoverNeXt(SMALL, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    return model, params


def test_functional_forward_matches_flax(small_model, rng):
    model, params = small_model
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    ref = model.apply(params, x)
    got = hovernext_forward(params, x, SMALL, dtype=jnp.float32)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=2e-4, rtol=1e-4)


def test_fused_block_matches_flax_block(rng):
    dim = 8
    blk = ConvNeXtBlock(dim, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, 16, 16, dim)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(blk.apply(params, x))
    got = np.asarray(
        fused_convnext_block(
            x, *block_params_from_flax(params["params"]), interpret=True
        )
    ).astype(np.float32)
    # kernel stores tensors in bf16 (f32 accumulation) — bf16-level parity
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-2
    assert got.shape == ref.shape


def test_fused_block_batch_padding(rng):
    """B not a multiple of images-per-step exercises the pad/slice path;
    padded rows must not leak into real outputs."""
    dim = 8
    blk = ConvNeXtBlock(dim, dtype=jnp.float32)
    x5 = jnp.asarray(rng.standard_normal((5, 16, 16, dim)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(2), x5)
    w = block_params_from_flax(params["params"])
    out5 = np.asarray(fused_convnext_block(x5, *w, interpret=True))
    out1 = np.asarray(fused_convnext_block(x5[:1], *w, interpret=True))
    assert out5.shape[0] == 5
    np.testing.assert_allclose(out5[0], out1[0], atol=1e-5)


def test_encoder_features_fused_matches_unfused(small_model, rng):
    _, params = small_model
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    enc = params["params"]["encoder"]
    ref = encoder_features(enc, x, SMALL, dtype=jnp.float32, fused_blocks=False)
    got = encoder_features(
        enc, x, SMALL, dtype=jnp.float32, fused_blocks=True, interpret=True
    )
    assert len(got) == len(ref) == 4
    for r, g in zip(ref, got):
        scale = float(np.abs(np.asarray(r)).max()) or 1.0
        assert np.abs(np.asarray(g) - np.asarray(r)).max() / scale < 3e-2


def test_upsample2x_bilinear_matches_resize(rng):
    from path_gene_multimodal_tpu.ops.pallas.decoder import upsample2x_bilinear

    x = jnp.asarray(rng.standard_normal((2, 9, 7, 5)).astype(np.float32))
    ref = jax.image.resize(x, (2, 18, 14, 5), method="bilinear")
    got = upsample2x_bilinear(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("with_skip", [True, False])
def test_fused_decoder_conv_matches_xla(rng, with_skip):
    from path_gene_multimodal_tpu.models.hovernext_fn import _conv, _ln
    from path_gene_multimodal_tpu.ops.pallas.decoder import fused_decoder_conv

    b, h, w, cx, cs, cout = 3, 16, 16, 6, 4, 10
    x = jnp.asarray(rng.standard_normal((b, h, w, cx)).astype(np.float32))
    skip = (
        jnp.asarray(rng.standard_normal((b, h, w, cs)).astype(np.float32))
        if with_skip else None
    )
    cin = cx + (cs if with_skip else 0)
    wk = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32) * 0.1)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(cout).astype(np.float32))
    lnb = jnp.asarray(0.1 * rng.standard_normal(cout).astype(np.float32))

    xb = jnp.concatenate([x, skip], axis=-1) if with_skip else x
    ref = _conv({"kernel": wk, "bias": bias}, xb, stride=1, pad=1, dtype=jnp.float32)
    ref = _ln({"scale": scale, "bias": lnb}, ref, jnp.float32)
    ref = np.asarray(jax.nn.gelu(ref, approximate=True))

    got = np.asarray(
        fused_decoder_conv(x, skip, wk, bias, scale, lnb, interpret=True)
    ).astype(np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() or 1)
    assert err < 2e-2, err


def test_fused_upsample_final_matches_xla(rng):
    """In-VMEM 2x bilinear + conv + GELU == resize + conv + gelu."""
    from path_gene_multimodal_tpu.models.hovernext_fn import _conv
    from path_gene_multimodal_tpu.ops.pallas.decoder import fused_upsample_final

    b, h, w, cin, cout = 2, 16, 24, 6, 5
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32) * 0.1)
    ref = jax.image.resize(x, (b, 2 * h, 2 * w, cin), method="bilinear")
    ref = _conv({"kernel": wk, "bias": bias}, ref, stride=1, pad=1, dtype=jnp.float32)
    ref = np.asarray(jax.nn.gelu(ref, approximate=True))
    got = np.asarray(
        fused_upsample_final(x, wk, bias, interpret=True)
    ).astype(np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() or 1)
    assert err < 2e-2, err


def test_lowres_decoder_matches_hires(small_model, rng):
    """The conv0∘upsample low-res parity fold (`lowres_decoder=True`,
    opt-in) is exact vs the plain nearest-up + concat + conv decoder —
    f32 rounding only, whole forward compared."""
    model, params = small_model
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    ref = hovernext_forward(
        params, x, SMALL, dtype=jnp.float32, lowres_decoder=False
    )
    got = hovernext_forward(
        params, x, SMALL, dtype=jnp.float32, lowres_decoder=True
    )
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=1e-4, rtol=1e-4
        )


def test_fused_final_heads_matches_xla(rng):
    """In-VMEM 2× bilinear + conv + GELU + folded heads == the plain
    resize → conv → gelu → head-matmul chain (bf16-level, NCHW output)."""
    from path_gene_multimodal_tpu.models.hovernext_fn import _conv
    from path_gene_multimodal_tpu.ops.pallas.decoder import fused_final_heads

    b, h, w, cin, cout, n_out = 2, 16, 24, 6, 5, 10
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32) * 0.1)
    wh = jnp.asarray(rng.standard_normal((cout, n_out)).astype(np.float32) * 0.3)
    bh = jnp.asarray(rng.standard_normal((n_out,)).astype(np.float32) * 0.1)
    ref = jax.image.resize(x, (b, 2 * h, 2 * w, cin), method="bilinear")
    ref = _conv({"kernel": wk, "bias": bias}, ref, stride=1, pad=1, dtype=jnp.float32)
    ref = np.asarray(jax.nn.gelu(ref, approximate=True)) @ np.asarray(wh) + np.asarray(bh)
    got = np.asarray(
        jnp.transpose(fused_final_heads(x, wk, bias, wh, bh, interpret=True),
                      (0, 2, 3, 1))
    ).astype(np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() or 1)
    assert err < 2e-2, err


@pytest.mark.parametrize("h", [32, 64, 96])  # 1 strip / edges only / middle strip
def test_fused_final_conv_gelu_matches_xla(rng, h):
    from path_gene_multimodal_tpu.models.hovernext_fn import _conv
    from path_gene_multimodal_tpu.ops.pallas.decoder import fused_final_conv_gelu

    b, c, cout = 2, 6, 5
    x = jnp.asarray(rng.standard_normal((b, h, h, c)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((3, 3, c, cout)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32) * 0.1)
    ref = _conv({"kernel": wk, "bias": bias}, x, stride=1, pad=1, dtype=jnp.float32)
    ref = np.asarray(jax.nn.gelu(ref, approximate=True))
    got = np.asarray(
        fused_final_conv_gelu(x, wk, bias, rows=32, interpret=True)
    ).astype(np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() or 1)
    assert err < 2e-2, err


def test_fused_forward_in_shard_map(small_model, rng):
    """Pallas fused blocks compose with shard_map over the tile axis —
    the mesh mode NucleiModel uses (GSPMD cannot partition custom calls,
    so per-shard execution is the only mesh-valid path)."""
    from jax.sharding import PartitionSpec as P

    from path_gene_multimodal_tpu.parallel.mesh import make_mesh

    _, params = small_model
    x = jnp.asarray(rng.random((8, 64, 64, 3)).astype(np.float32))
    ref = hovernext_forward(
        params, x, SMALL, dtype=jnp.float32, fused_blocks=True, interpret=True
    )
    mesh = make_mesh(8)
    fn = lambda p, xx: hovernext_forward(
        p, xx, SMALL, dtype=jnp.float32, fused_blocks=True, interpret=True
    )
    sharded = jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=(P(), P("tiles")), out_specs=P("tiles"),
            check_vma=False,  # vma tracking can't trace pallas kernel bodies
        )
    )
    got = sharded(params, x)
    for k in ref:
        # bf16-level bar: the fused final stage stores bf16 internally and
        # XLA may fuse the surrounding casts differently per compile
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        scale = float(np.abs(r).max()) or 1.0
        assert np.abs(g - r).max() / scale < 2e-2, k


def test_fused_forward_full_model(small_model, rng):
    """End-to-end: fused functional forward vs flax apply (bf16-level)."""
    model, params = small_model
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    ref = model.apply(params, x)
    got = hovernext_forward(
        params, x, SMALL, dtype=jnp.float32, fused_blocks=True, interpret=True
    )
    for k in ref:
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        scale = float(np.abs(r).max()) or 1.0
        assert np.abs(g - r).max() / scale < 5e-2, k


def test_final_heads_lowres_exact(rng):
    """The composite-weight reformulation (conv∘upsample collapsed to
    parity convs + depth-to-space, borders strip-fixed, heads folded in the
    low-res domain) is EXACT vs resize+conv+gelu+heads — f32 rounding only,
    borders included."""
    from path_gene_multimodal_tpu.models.hovernext_fn import (
        _conv,
        _final_heads_lowres,
    )

    b, h, w, cin, cout = 2, 16, 24, 6, 5
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32) * 0.1)
    p_final = {"kernel": wk, "bias": bias}
    ref = jax.image.resize(x, (b, 2 * h, 2 * w, cin), method="bilinear")
    ref = _conv(p_final, ref, stride=1, pad=1, dtype=jnp.float32)
    ref = np.asarray(jax.nn.gelu(ref, approximate=True))

    # heads folded in the low-res domain == heads applied at full res
    hw = {
        n: {"kernel": jnp.asarray(
                rng.standard_normal((1, 1, cout, d)).astype(np.float32) * 0.3),
            "bias": jnp.asarray(rng.standard_normal((d,)).astype(np.float32))}
        for n, d in (("head_np", 2), ("head_hv", 2), ("head_tp", 6))
    }
    params = {"final_conv": p_final, **hw}
    wcat = np.concatenate(
        [np.asarray(hw[n]["kernel"]).reshape(cout, -1) for n in
         ("head_np", "head_hv", "head_tp")], axis=-1)
    bcat = np.concatenate(
        [np.asarray(hw[n]["bias"]) for n in ("head_np", "head_hv", "head_tp")])
    ref_h = ref @ wcat + bcat
    got_h = np.asarray(_final_heads_lowres(params, x, jnp.float32))
    np.testing.assert_allclose(got_h, ref_h, atol=1e-4)

    # the Pallas kernel variant (VMEM-resident GELU, block-diag head
    # matmul) matches at bf16 level — it stores tensors in bf16 internally
    from path_gene_multimodal_tpu.models.hovernext_fn import (
        _final_heads_lowres_pallas,
    )

    got_p = np.asarray(
        _final_heads_lowres_pallas(params, x, jnp.float32, interpret=True)
    )
    scale = float(np.abs(ref_h).max()) or 1.0
    assert np.abs(got_p - ref_h).max() / scale < 2e-2


def test_forward_fused_final_pallas_matches_plain(small_model, rng):
    """Whole forward with ``fused_final='pallas'`` == the plain resize →
    conv → gelu → heads path (bf16-level)."""
    model, params = small_model
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    ref = hovernext_forward(
        params, x, SMALL, dtype=jnp.float32, fused_final=False
    )
    got = hovernext_forward(
        params, x, SMALL, dtype=jnp.float32, fused_final="pallas",
        interpret=True,
    )
    for k in ref:
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        scale = float(np.abs(r).max()) or 1.0
        assert np.abs(g - r).max() / scale < 2e-2, k
