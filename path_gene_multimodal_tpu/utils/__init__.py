from path_gene_multimodal_tpu.utils.log import StageTimer, get_logger, stage  # noqa: F401
