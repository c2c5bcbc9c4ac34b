"""Pallas TPU kernels for the hot ops.

Kernels keep iterative stencil state resident in VMEM instead of bouncing
HBM every XLA op — the difference for the watershed flood, whose XLA
formulation issues hundreds of tiny neighbor-min kernels per tile.
Every kernel has an XLA fallback; dispatch is by backend
(``pallas_supported()``).
"""

from path_gene_multimodal_tpu.ops.pallas.flood import (  # noqa: F401
    pallas_marker_watershed,
    pallas_supported,
)
