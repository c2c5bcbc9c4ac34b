"""path_gene_multimodal_tpu — TPU-native WSI spatial-analysis framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
pipeline ``himangi2003/path_gene_multimodal`` (TNBC whole-slide-image
tessellation → tile embedding → zero-shot annotation → TME ROI → polygon
export → nuclei segmentation → molecular prediction → spatial cell graphs),
redesigned TPU-first:

- all array math (tissue masking, morphology, connected components,
  contours, watershed, neighbor search) runs on-device as XLA/Pallas ops;
- model inference (CLIP towers, HoverNeXt, ResNet34-IDaRS) is Flax under
  ``jit``/``shard_map`` over a device mesh, bf16 on the MXU;
- host-side code is confined to slide decode, artifact serialization and
  visualization.

The public artifact schemas (tessellation H5, annotations CSV, nuclei
parquet, GeoJSON, molecular CSV, done-flag JSON) are bit/schema-compatible
with the reference — see SURVEY.md §2 "Data contracts".
"""

__version__ = "0.1.0"

from path_gene_multimodal_tpu.config import PipelineConfig, default_config  # noqa: F401
