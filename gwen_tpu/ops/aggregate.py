"""Sparse neighborhood aggregation — the framework's core op.

This replaces the torch-scatter / torch-sparse / pyg-lib CUDA kernels behind
the reference's ``GCNConv`` (SURVEY §2.2). Semantics for every backend::

    out[r] = sum over edges e with receivers[e] == r of weights[e] * x[senders[e]]

Backends:

* ``segment``  — pure XLA: gather + ``jax.ops.segment_sum``. Correctness
  baseline; runs on CPU/TPU; used by tests as the golden path.
* ``dense``    — ``adj @ x`` on the MXU for :class:`DenseGraph` (the
  reference's ~125-node fully-connected member graph densifies for free).
* ``pallas``   — blocked-ELL gather-MMA-scatter Pallas kernel for mesh-scale
  graphs (``gwen_tpu.ops.spmm_pallas``).

``aggregate`` dispatches on the graph container type.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gwen_tpu.graph.graph import BlockEllGraph, DenseGraph, Graph

Array = jnp.ndarray


def aggregate_segment(graph: Graph, x: Array) -> Array:
    """Gather-scale-scatter via XLA ``segment_sum`` (static shapes, jit-safe)."""
    if x.shape[0] != graph.num_nodes:
        raise ValueError(f"x has {x.shape[0]} rows, graph has {graph.num_nodes} nodes")
    msgs = x[graph.senders] * graph.weights[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        msgs, graph.receivers, num_segments=graph.num_nodes, indices_are_sorted=False
    )


def aggregate_dense(graph: DenseGraph, x: Array) -> Array:
    """Dense normalized-adjacency matmul (MXU path for small graphs)."""
    return jnp.dot(graph.adj.astype(x.dtype), x, preferred_element_type=x.dtype)


def aggregate_block_ell_reference(graph: BlockEllGraph, x: Array) -> Array:
    """jnp reference for the blocked-ELL layout (used to validate the Pallas
    kernel); mathematically identical to :func:`aggregate_segment`."""
    n_pad = graph.num_padded_nodes
    xp = jnp.zeros((n_pad, x.shape[1]), x.dtype).at[: x.shape[0]].set(x)
    # Absolute source index per (node, slot): window-relative + block window start.
    win = jnp.repeat(graph.window_start, graph.block_size)  # (N_pad,)
    abs_idx = graph.nbr + win[:, None]
    gathered = xp[abs_idx]  # (N_pad, D, F)
    out = jnp.einsum(
        "nd,ndf->nf", graph.nbr_weight.astype(x.dtype), gathered
    )
    return out[: x.shape[0]]


def aggregate(graph, x: Array, backend: str = "auto") -> Array:
    """Dispatch aggregation by graph container type / requested backend."""
    if isinstance(graph, DenseGraph):
        return aggregate_dense(graph, x)
    if isinstance(graph, BlockEllGraph):
        if backend in ("auto", "pallas"):
            from gwen_tpu.ops.spmm_pallas import spmm_block_ell

            return spmm_block_ell(graph, x)
        return aggregate_block_ell_reference(graph, x)
    if isinstance(graph, Graph):
        return aggregate_segment(graph, x)
    raise TypeError(f"Unknown graph type: {type(graph)!r}")
