from gwen_tpu.ops.aggregate import (
    aggregate,
    aggregate_block_ell_reference,
    aggregate_block_tiles_reference,
    aggregate_dense,
    aggregate_segment,
)

__all__ = [
    "aggregate",
    "aggregate_block_ell_reference",
    "aggregate_block_tiles_reference",
    "aggregate_dense",
    "aggregate_segment",
]
