"""Pallas TPU kernels for the hot ops.

Kernels keep iterative stencil state resident in VMEM instead of bouncing
HBM every XLA op — the difference for the watershed flood, whose XLA
formulation issues hundreds of tiny neighbor-min kernels per tile.
Every kernel has an XLA fallback; dispatch is by backend
(``pallas_supported()``).
"""

from path_gene_multimodal_tpu.ops.pallas.cc import (  # noqa: F401
    pallas_label_components,
    pallas_label_components_tiled,
)
from path_gene_multimodal_tpu.ops.pallas.cc_sizes import (  # noqa: F401
    pallas_cc_sizes,
)
from path_gene_multimodal_tpu.ops.pallas.convnext_block import (  # noqa: F401
    fused_convnext_block,
)
from path_gene_multimodal_tpu.ops.pallas.decoder import (  # noqa: F401
    fused_decoder_conv,
    fused_final_conv_gelu,
)
from path_gene_multimodal_tpu.ops.pallas.flood import (  # noqa: F401
    pallas_marker_watershed,
    pallas_supported,
)
from path_gene_multimodal_tpu.ops.pallas.instance_stats import (  # noqa: F401
    instance_stats_pallas,
)
