"""Exact analytic FLOP accounting for the framework's model families.

The bench (bench.py) reports tiles/s per stage; this module supplies the
matching work counts so every rate can also be read as MFU (model FLOP
utilization) against the chip's peak — the reference publishes no numbers
(SURVEY.md §6), so "is this actually fast?" must be answerable from the
bench output alone rather than from an absolute tiles/s target.

Counts are derived from the model configs (the same dataclasses the Flax
modules consume), not from XLA: XLA's ``cost_analysis`` reports 0 FLOPs
for Pallas custom calls, and the production seg forward runs its encoder
inside Pallas kernels (``ops.pallas.convnext_block``). A golden test pins
these counts against ``cost_analysis`` on the pure-XLA paths.

MXU vs VPU split: depthwise convolutions perform C independent 2-D
convolutions — no shared contraction — so they cannot ride the 128×128
systolic array and execute as shifted fused multiply-adds on the 8×128
VPU instead. Their MACs are tallied separately (``vpu_macs``): folding
them into an MFU denominator would overstate achievable utilization,
while ignoring them would hide the encoder's real floor (ConvNeXt's dw7×7
is the measured seg-forward bottleneck — see docs/ROOFLINE.md).

Reference workloads these models rebuild: CLIP/Virchow2 tile embedding
(``extract_embedding_from_tiles.py:9-70``), HoverNeXt nuclei segmentation
(``hovernet_inference.py:82-170``), IDaRS ResNet34 molecular ensemble
(``molecular_feature_extraction.py:110-139``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Peak dense bf16 matmul throughput of one TPU v5e chip (the bench target
# hardware), FLOP/s. The VPU peak is derived from the same spec sheet:
# 4 MXUs' worth of vector lanes ≈ 8 ops/cycle · 8 sublanes · 128 lanes at
# ~0.94 GHz ≈ 7.5e12 FLOP/s for fused multiply-adds (2 FLOPs/MAC).
PEAK_BF16_FLOPS_V5E = 197e12
PEAK_VPU_FLOPS_V5E = 7.5e12


@dataclass
class FlopCount:
    """MAC tallies for one forward pass of one input.

    ``mxu_macs``: contractions that map onto the MXU (dense convs, matmuls,
    attention einsums). ``vpu_macs``: depthwise-conv MACs (VPU-bound on
    TPU — see module docstring). 1 MAC = 2 FLOPs.
    """

    mxu_macs: int = 0
    vpu_macs: int = 0
    by_part: dict[str, int] = field(default_factory=dict)

    def add(self, part: str, macs: int, vpu: bool = False) -> None:
        if vpu:
            self.vpu_macs += macs
        else:
            self.mxu_macs += macs
        self.by_part[part] = self.by_part.get(part, 0) + macs

    @property
    def mxu_flops(self) -> int:
        return 2 * self.mxu_macs

    @property
    def vpu_flops(self) -> int:
        return 2 * self.vpu_macs

    @property
    def total_flops(self) -> int:
        return 2 * (self.mxu_macs + self.vpu_macs)

    def scaled(self, factor: int) -> "FlopCount":
        return FlopCount(
            self.mxu_macs * factor,
            self.vpu_macs * factor,
            {k: v * factor for k, v in self.by_part.items()},
        )


def _conv_macs(out_px: int, k: int, cin: int, cout: int) -> int:
    return out_px * k * k * cin * cout


def hovernext_flops(cfg, input_size: int | None = None, tta: int = 1) -> FlopCount:
    """HoverNeXt forward (models/hovernext.py): ConvNeXtV2 encoder + U-Net
    decoder + bilinear-upsample final conv + three 1×1 heads.

    The low-res composite final formulation (models/hovernext_fn.py
    ``_final_heads_lowres``) is FLOP-neutral vs the plain path (the 2×
    parity fold redistributes, never duplicates, the taps), so one count
    covers both. ``tta`` multiplies everything (tta_forward runs the full
    network per rotation)."""
    s = input_size or cfg.input_size
    enc = cfg.encoder
    fc = FlopCount()
    r = s // 4
    # stem is a stride-4 4×4 conv: out_px=(s/4)², k²·cin taps each
    fc.add("stem", _conv_macs(r * r, 4, 3, enc.dims[0]))
    for st in range(enc.num_stages):
        c = enc.dims[st]
        if st > 0:
            r //= 2
            fc.add(f"down{st}", _conv_macs(r * r, 2, enc.dims[st - 1], c))
        px = r * r
        for _ in range(enc.depths[st]):
            fc.add(f"enc_stage{st}_dw", px * c * 49, vpu=True)
            fc.add(f"enc_stage{st}_pw", px * c * 4 * c + px * 4 * c * c)
    # decoder: x starts at s/32; level i convs run at s/32·2^(i+1)
    skips = [enc.dims[2], enc.dims[1], enc.dims[0], 0]
    prev_c = enc.dims[-1]
    r = s // 32
    for i, dim in enumerate(cfg.decoder_dims):
        r *= 2
        px = r * r
        fc.add(f"dec{i}", _conv_macs(px, 3, prev_c + skips[i], dim))
        fc.add(f"dec{i}", _conv_macs(px, 3, dim, dim))
        prev_c = dim
    # final: 2× bilinear upsample then 3×3 conv at full res
    fc.add("final_conv", _conv_macs(s * s, 3, prev_c, cfg.decoder_dims[-1]))
    fc.add("heads", s * s * cfg.decoder_dims[-1] * (4 + cfg.tp_channels))
    return fc.scaled(tta) if tta > 1 else fc


def vit_flops(cfg, input_size: int | None = None) -> FlopCount:
    """ViT image-tower forward — covers both the CLIP ``VisionConfig``
    (models/clip.py) and the timm ``TimmViTConfig`` (models/vit_timm.py,
    Virchow2: packed SwiGLU, register tokens). Attention einsums count as
    L²·D each for scores and mixing (summed over heads)."""
    s = input_size or cfg.image_size
    grid = s // cfg.patch_size
    n_patch = grid * grid
    d = cfg.width
    seq = 1 + getattr(cfg, "num_registers", 0) + n_patch
    fc = FlopCount()
    fc.add("patch_embed", n_patch * cfg.patch_size**2 * 3 * d)
    mlp_type = getattr(cfg, "mlp_type", None)
    if mlp_type == "swiglu":
        hid = cfg.mlp_hidden
        mlp = seq * d * hid + seq * (hid // 2) * d
    else:
        hid = int(d * getattr(cfg, "mlp_ratio", 4.0))
        mlp = 2 * seq * d * hid
    per_layer = (
        seq * d * 3 * d  # qkv
        + seq * seq * d  # q·kᵀ over all heads
        + seq * seq * d  # scores·v
        + seq * d * d  # out proj
        + mlp
    )
    fc.add("transformer", per_layer * cfg.layers)
    out_dim = getattr(cfg, "out_dim", None)
    if out_dim:
        fc.add("proj", d * out_dim)
    return fc


def resnet_flops(cfg, input_size: int = 224, num_models: int = 1) -> FlopCount:
    """ResNet-34 (models/resnet.py BasicBlock layout) forward;
    ``num_models`` scales for the vmapped IDaRS ensemble (6 task heads =
    6 full backbones, molecular_feature_extraction.py:21-28)."""
    fc = FlopCount()
    r = input_size // 2
    fc.add("stem", _conv_macs(r * r, 7, 3, cfg.width))
    r //= 2  # maxpool
    cin = cfg.width
    for s, blocks in enumerate(cfg.stage_sizes):
        cout = cfg.width * (2**s)
        for b in range(blocks):
            stride = 2 if (s > 0 and b == 0) else 1
            if stride == 2:
                r //= 2
            px = r * r
            fc.add(f"stage{s}", _conv_macs(px, 3, cin, cout))
            fc.add(f"stage{s}", _conv_macs(px, 3, cout, cout))
            if cin != cout or stride != 1:
                fc.add(f"stage{s}_down", _conv_macs(px, 1, cin, cout))
            cin = cout
    fc.add("fc", cin * cfg.num_classes)
    return fc.scaled(num_models) if num_models > 1 else fc


def mfu(
    items_per_sec: float,
    flops_per_item: float,
    peak_flops: float = PEAK_BF16_FLOPS_V5E,
) -> float:
    """Model FLOP utilization: fraction of peak the measured rate implies."""
    return items_per_sec * flops_per_item / peak_flops
