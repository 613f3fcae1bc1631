"""Sparse neighborhood aggregation — the framework's core op.

This replaces the torch-scatter / torch-sparse / pyg-lib CUDA kernels behind
the reference's ``GCNConv`` (SURVEY §2.2). Semantics for every backend::

    out[..., r, :] = sum over edges e with receivers[e] == r
                     of weights[e] * x[..., senders[e], :]

All backends accept ``(..., N, F)`` — aggregation is node-wise linear, so
leading batch dims are free (folded into features or broadcast), which keeps
Pallas kernels out of ``vmap``.

Backends:

* ``segment``  — pure XLA: gather + ``jax.ops.segment_sum``. Correctness
  baseline; runs everywhere; the golden path for tests.
* ``dense``    — ``adj @ x`` on the MXU for :class:`DenseGraph` (the
  reference's ~125-node fully-connected member graph densifies for free).
* ``pallas``   — blocked-ELL gather-MMA-scatter Pallas kernel for mesh-scale
  graphs (``gwen_tpu.ops.spmm_pallas``).

``aggregate`` dispatches on the graph container type (including
:class:`gwen_tpu.parallel.halo.HaloGraph` for partitioned meshes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gwen_tpu.graph.graph import (
    BlockEllGraph,
    BlockTileGraph,
    DenseGraph,
    DiagWindowGraph,
    Graph,
    MultiLevelGraph,
    SlidingDenseGraph,
    SlidingPackedGraph,
    SlidingRank1Graph,
    WindowedDenseGraph,
)

Array = jnp.ndarray


def aggregate_segment(graph: Graph, x: Array) -> Array:
    """Gather-scale-scatter via XLA ``segment_sum`` (static shapes, jit-safe)."""
    if x.shape[-2] != graph.num_nodes:
        raise ValueError(
            f"x has {x.shape[-2]} node rows, graph has {graph.num_nodes} nodes"
        )
    # Move the node axis to the front so segment_sum sees it as leading.
    xm = jnp.moveaxis(x, -2, 0)  # (N, ..., F)
    w = graph.weights.astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    msgs = xm[graph.senders] * w
    out = jax.ops.segment_sum(
        msgs, graph.receivers, num_segments=graph.num_nodes, indices_are_sorted=False
    )
    return jnp.moveaxis(out, 0, -2)


def aggregate_dense(graph: DenseGraph, x: Array) -> Array:
    """Dense normalized-adjacency matmul (MXU path for small graphs).

    ``jnp.matmul`` broadcasts over leading batch dims: (N,N) @ (...,N,F).
    """
    return jnp.matmul(graph.adj.astype(x.dtype), x)


def aggregate_block_ell_reference(graph: BlockEllGraph, x: Array) -> Array:
    """jnp reference for the blocked-ELL layout (validates the Pallas kernel);
    mathematically identical to :func:`aggregate_segment`."""
    leading = x.shape[:-2]
    n, f = x.shape[-2], x.shape[-1]
    xp = jnp.zeros(leading + (graph.src_rows, f), x.dtype)
    xp = xp.at[..., :n, :].set(x)
    # Absolute source index per (node, slot): window-relative + block window.
    win = jnp.repeat(graph.window_start, graph.block_size)  # (N_pad,)
    abs_idx = graph.nbr + win[:, None]
    gathered = jnp.take(xp, abs_idx, axis=-2)  # (..., N_pad, D, F)
    out = jnp.einsum("nd,...ndf->...nf", graph.nbr_weight.astype(x.dtype), gathered)
    out_rows = n if graph.src_rows == graph.num_padded_nodes else graph.num_padded_nodes
    return out[..., :out_rows, :]


def aggregate_block_tiles_reference(graph: BlockTileGraph, x: Array) -> Array:
    """jnp reference for the block-tile (BSR) layout; validates the v2 Pallas
    kernel. Mathematically identical to :func:`aggregate_segment`."""
    leading = x.shape[:-2]
    n, f = x.shape[-2], x.shape[-1]
    xp = jnp.zeros(leading + (graph.num_src_rows, f), x.dtype)
    xp = xp.at[..., :n, :].set(x)
    n_pad = graph.num_padded_nodes
    bs = graph.block_size
    dt = graph.tile_degree
    # Absolute source index per (node, flat slot): tile base + within-tile.
    flat = graph.tnbr.shape[1]
    slot_tile = (jnp.arange(flat) // dt).clip(0, graph.tiles_max - 1)  # (flat,)
    node_block = jnp.arange(n_pad) // bs  # (N_pad,)
    tile_of_slot = graph.tile_idx[node_block[:, None], slot_tile[None, :]]
    abs_idx = tile_of_slot * bs + graph.tnbr
    gathered = jnp.take(xp, abs_idx, axis=-2)  # (..., N_pad, flat, f)
    out = jnp.einsum("nk,...nkf->...nf", graph.tw.astype(x.dtype), gathered)
    out_rows = n if graph.num_src_rows == n_pad else n_pad
    return out[..., :out_rows, :]


def aggregate_windowed_dense_reference(graph: WindowedDenseGraph, x: Array) -> Array:
    """jnp reference for the streamed-S layout (validates the v3 kernel)."""
    n, f = x.shape[-2], x.shape[-1]
    leading = x.shape[:-2]
    xp = jnp.zeros(leading + (graph.num_src_rows, f), x.dtype)
    xp = xp.at[..., :n, :].set(x)
    bs = graph.block_size
    nblocks = graph.num_blocks

    def one_block(s_blk, start):
        win = jax.lax.dynamic_slice_in_dim(xp, start, graph.window_size, axis=-2)
        return jnp.einsum("bw,...wf->...bf", s_blk.astype(x.dtype), win)

    s_blocks = graph.s_mat.reshape(nblocks, bs, graph.window_size)
    outs = [one_block(s_blocks[b], graph.window_start[b]) for b in range(nblocks)]
    out = jnp.concatenate(outs, axis=-2)
    out_rows = n if graph.num_src_rows == graph.num_padded_nodes else graph.num_padded_nodes
    return out[..., :out_rows, :]


def aggregate_sliding_dense_reference(graph: SlidingDenseGraph, x: Array) -> Array:
    """jnp reference for the sliding-ring layout (validates the v4 kernel)."""
    n, f = x.shape[-2], x.shape[-1]
    leading = x.shape[:-2]
    src_alloc = ((graph.num_src_rows + graph.block_size - 1)
                 // graph.block_size) * graph.block_size
    xp = jnp.zeros(leading + (src_alloc, f), x.dtype)
    xp = xp.at[..., :n, :].set(x)
    bs = graph.block_size
    ring = graph.ring_rows
    w = graph.window_size
    s_blocks = graph.s_mat.reshape(graph.num_blocks, bs, ring)
    outs = []
    for b in range(graph.num_blocks):
        start = graph.window_start[b]
        win = jax.lax.dynamic_slice_in_dim(xp, start, w, axis=-2)
        cols = (start + jnp.arange(w)) % ring  # ring-layout columns
        s_win = jnp.take(s_blocks[b].astype(x.dtype), cols, axis=1)  # (bs, w)
        outs.append(jnp.einsum("bw,...wf->...bf", s_win, win))
    out = jnp.concatenate(outs, axis=-2)
    n_pad = graph.num_padded_nodes
    out_rows = n if graph.num_src_rows == n_pad else n_pad
    out = out[..., :out_rows, :]
    # Escape-window fixup (same composite as the Pallas path).
    from gwen_tpu.ops.spmm_pallas import _sliding_escape_add

    return _sliding_escape_add(graph, x, out)


def aggregate_diag_window_reference(graph: DiagWindowGraph, x: Array) -> Array:
    """jnp reference for the diagonal-window superblock layout (validates the
    v6 kernel). Window starts are reconstructed as ``xbase[b // T] +
    offsets[b]``; the escape fixup rides the same composite as the Pallas
    path."""
    n, f = x.shape[-2], x.shape[-1]
    leading = x.shape[:-2]
    src_alloc = graph.num_src_rows
    n_pad = graph.num_padded_nodes
    rows = min(n, src_alloc)
    xp = jnp.zeros(leading + (src_alloc, f), x.dtype)
    xp = xp.at[..., :rows, :].set(x[..., :rows, :])
    packed = graph.s_pack is not None
    if packed:
        # Mirror the kernel's math: S = a_r a_s ⊙ S01 — column scales on
        # the window input, the a_r row scale applied AFTER the escape add
        # (escape tables carry w = a_s, so a_r distributes over both
        # terms; see DiagWindowGraph.s_pack).
        xp = xp * graph.r1_col[:src_alloc].astype(xp.dtype)[:, None]
        gpb = graph.block_size // 8
        bit = jnp.asarray(graph.s_pack)
        nb_ = graph.num_blocks
        w_ = graph.window_size
        # unpack tile order: block-local row l = bit l//gpb of packed row
        # l % gpb.
        pk = bit.reshape(nb_, gpb, w_)
        rows_l = jnp.arange(graph.block_size)
        s01 = ((pk[:, rows_l % gpb, :]
                >> (rows_l // gpb)[None, :, None].astype(jnp.uint8)) & 1)
        s_blocks = s01.astype(x.dtype)
    else:
        s_blocks = graph.s_mat.reshape(
            graph.num_blocks, graph.block_size, graph.window_size
        ).astype(x.dtype)
    w = graph.window_size
    outs = []
    for b in range(graph.num_blocks):
        start = graph.xbase[b // graph.superblock] + graph.offsets[b]
        win = jax.lax.dynamic_slice_in_dim(xp, start, w, axis=-2)
        outs.append(jnp.einsum("bw,...wf->...bf", s_blocks[b], win))
    out = jnp.concatenate(outs, axis=-2)
    # Pre-padded callers (EncodeProcessDecode keeps the chain at n_pad
    # rows) get their row count back; everyone else gets num_nodes.
    out_rows = n if n in (n_pad, src_alloc) else graph.num_nodes
    out = out[..., :out_rows, :]
    from gwen_tpu.ops.spmm_pallas import _sliding_escape_add

    out = _sliding_escape_add(graph, x, out)
    if packed:
        out = out * graph.r1_row[:out_rows].astype(out.dtype)[:, None]
    return out


def aggregate_sliding_packed_reference(graph: SlidingPackedGraph, x: Array) -> Array:
    """jnp reference for the bit-packed layout (validates the v5 kernel)."""
    from gwen_tpu.graph.graph import _packed_row_bit

    n = x.shape[-2]
    # Tile-order unpack: global row i = bit pbit[i] of packed row prow[i].
    prow, pbit = _packed_row_bit(graph.num_padded_nodes, graph.block_size)
    s01 = (
        (graph.packed[prow] >> jnp.asarray(pbit[:, None], jnp.uint8)) & 1
    ).astype(x.dtype)
    core = SlidingDenseGraph(
        s_mat=s01,
        window_start=graph.window_start,
        delta_blocks=graph.delta_blocks,
        num_nodes=graph.num_nodes,
        num_edges=graph.num_edges,
        block_size=graph.block_size,
        window_size=graph.window_size,
        max_delta_blocks=graph.max_delta_blocks,
        num_src_rows=graph.num_src_rows,
    )
    xs = x * graph.col_scale[:n, None].astype(x.dtype)
    out = aggregate_sliding_dense_reference(core, xs)
    return out * graph.row_scale[: out.shape[-2], None].astype(out.dtype)


def aggregate(graph, x: Array, backend: str = "auto") -> Array:
    """Dispatch aggregation by graph container type / requested backend."""
    # Late import: parallel depends on ops for local aggregation.
    from gwen_tpu.parallel.halo import HaloDiagGraph, HaloGraph, aggregate_halo

    if isinstance(graph, MultiLevelGraph):
        out = aggregate(graph.subgraphs[0], x, backend=backend)
        for sub in graph.subgraphs[1:]:
            out = out + aggregate(sub, x, backend=backend)
        return out
    if isinstance(graph, DenseGraph):
        return aggregate_dense(graph, x)
    if isinstance(graph, (HaloGraph, HaloDiagGraph)):
        return aggregate_halo(graph, x, backend=backend)
    if isinstance(graph, WindowedDenseGraph):
        if backend in ("auto", "pallas"):
            from gwen_tpu.ops.spmm_pallas import spmm_windowed_dense

            return spmm_windowed_dense(graph, x)
        return aggregate_windowed_dense_reference(graph, x)
    if isinstance(graph, DiagWindowGraph):
        if backend in ("auto", "pallas"):
            from gwen_tpu.ops.spmm_pallas import spmm_diag_window

            return spmm_diag_window(graph, x)
        return aggregate_diag_window_reference(graph, x)
    if isinstance(graph, SlidingPackedGraph):
        if backend in ("auto", "pallas"):
            from gwen_tpu.ops.spmm_pallas import spmm_sliding_packed

            return spmm_sliding_packed(graph, x)
        return aggregate_sliding_packed_reference(graph, x)
    if isinstance(graph, SlidingRank1Graph):
        n = x.shape[-2]
        if backend in ("auto", "pallas"):
            from gwen_tpu.ops.spmm_pallas import spmm_sliding_rank1

            return spmm_sliding_rank1(graph, x)
        xs = x * graph.col_scale[:n, None].astype(x.dtype)
        out = aggregate_sliding_dense_reference(graph.core, xs)
        return out * graph.row_scale[: out.shape[-2], None].astype(out.dtype)
    if isinstance(graph, SlidingDenseGraph):
        if backend in ("auto", "pallas"):
            from gwen_tpu.ops.spmm_pallas import spmm_sliding_dense

            return spmm_sliding_dense(graph, x)
        return aggregate_sliding_dense_reference(graph, x)
    if isinstance(graph, BlockTileGraph):
        if backend in ("auto", "pallas"):
            from gwen_tpu.ops.spmm_pallas import spmm_block_tiles

            return spmm_block_tiles(graph, x)
        return aggregate_block_tiles_reference(graph, x)
    if isinstance(graph, BlockEllGraph):
        if backend in ("auto", "pallas"):
            from gwen_tpu.ops.spmm_pallas import spmm_block_ell

            return spmm_block_ell(graph, x)
        return aggregate_block_ell_reference(graph, x)
    if isinstance(graph, Graph):
        return aggregate_segment(graph, x)
    raise TypeError(f"Unknown graph type: {type(graph)!r}")
