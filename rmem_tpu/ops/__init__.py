from rmem_tpu.ops.resize import (  # noqa: F401
    interp_matrix,
    resize_bilinear,
    resize_nearest,
)
from rmem_tpu.ops.masks import one_hot_mask, id_shuffle_matrix  # noqa: F401
from rmem_tpu.ops.temporal_pe import interpolate_temporal_pe  # noqa: F401
