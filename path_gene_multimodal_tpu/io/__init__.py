from path_gene_multimodal_tpu.io.slide import (  # noqa: F401
    ArraySlide,
    SlideReader,
    open_slide,
    synthetic_wsi,
)
