from gwen_tpu.graph.graph import (
    BlockEllGraph,
    BlockTileGraph,
    DenseGraph,
    Graph,
    WindowedDenseGraph,
    build_graph,
    gcn_normalize,
    to_block_ell,
    to_block_tiles,
    to_dense,
    to_windowed_dense,
)
from gwen_tpu.graph.build import (
    complete_edges,
    erdos_renyi_edges,
    grid2d_edges,
    icosphere_edges,
)
from gwen_tpu.graph.reorder import apply_order, bandwidth, rcm_order

__all__ = [
    "BlockEllGraph",
    "BlockTileGraph",
    "DenseGraph",
    "Graph",
    "WindowedDenseGraph",
    "build_graph",
    "gcn_normalize",
    "to_block_ell",
    "to_block_tiles",
    "to_dense",
    "to_windowed_dense",
    "complete_edges",
    "erdos_renyi_edges",
    "grid2d_edges",
    "icosphere_edges",
    "apply_order",
    "bandwidth",
    "rcm_order",
]
