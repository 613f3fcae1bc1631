from gwen_tpu.ops.aggregate import (
    aggregate,
    aggregate_block_ell_reference,
    aggregate_block_tiles_reference,
    aggregate_dense,
    aggregate_segment,
)
from gwen_tpu.ops.attention_pallas import (
    diag_matvec,
    diag_sddmm,
    diag_spmm_t,
    windowed_attention,
)

__all__ = [
    "aggregate",
    "aggregate_block_ell_reference",
    "aggregate_block_tiles_reference",
    "aggregate_dense",
    "aggregate_segment",
    "diag_matvec",
    "diag_sddmm",
    "diag_spmm_t",
    "windowed_attention",
]
