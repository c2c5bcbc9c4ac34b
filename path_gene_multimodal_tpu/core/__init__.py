from path_gene_multimodal_tpu.core.artifacts import (  # noqa: F401
    read_tessellation_h5,
    write_tessellation_h5,
    write_features_h5,
    read_features_h5,
    export_geojson,
    load_geojson,
)
from path_gene_multimodal_tpu.core.jobs import (  # noqa: F401
    SlideJob,
    already_done,
    release_lock,
    try_acquire_lock,
    write_done_flag,
    write_error_file,
)
