"""Halo-exchange aggregation over a partitioned mesh graph.

This is the framework's scaling axis for large weather meshes (SURVEY §2.3:
the reference has no analog — it folds the spatial field into node features
and coarsens when it doesn't fit). Nodes are RCM-ordered and split into
contiguous, equal-size partitions over the mesh ``graph`` axis. Because RCM
bounds the graph bandwidth, every cross-partition edge reaches at most
``halo`` rows into the two neighboring partitions, so one bidirectional
``ppermute`` ring exchange per aggregation delivers all remote source rows.

:class:`HaloGraph` is the *local* view used inside ``shard_map``: per-device
ELL tables whose source indices are relative to the halo-extended local array
``[left-halo | local | right-halo]``. ``aggregate_halo`` does the exchange +
local blocked-ELL aggregation (Pallas on TPU, jnp reference elsewhere), and
``gwen_tpu.ops.aggregate`` dispatches to it, so models are parallelism-agnostic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gwen_tpu.graph.graph import BlockEllGraph

Array = jnp.ndarray


@struct.dataclass
class HaloGraph:
    """Per-device partition of a mesh graph (constructed inside shard_map by
    slicing the stacked tables from ``gwen_tpu.parallel.partition``)."""

    nbr: Array  # (n_local_pad, D) int32, window-relative into ext space
    nbr_weight: Array  # (n_local_pad, D) float32
    window_start: Array  # (n_local_pad // block, ) int32 into ext space
    axis_name: str = struct.field(pytree_node=False)
    halo: int = struct.field(pytree_node=False)
    n_local: int = struct.field(pytree_node=False)
    block_size: int = struct.field(pytree_node=False)
    window_size: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)
    # Optional dense scatter matrix for a streamed-S local kernel; None ->
    # blocked-ELL path. With ``delta_blocks`` set it is the *ring-layout*
    # matrix (n_local, ring_rows) of the sliding kernel (v4, flagship) and
    # ``window_start`` holds the monotonic clamped starts; otherwise the
    # windowed matrix (n_local, window) of the v3 kernel.
    s_mat: "Array | None" = None
    delta_blocks: "Array | None" = None  # (n_local // block,) int32
    ring_rows: int = struct.field(pytree_node=False, default=0)
    max_delta: int = struct.field(pytree_node=False, default=0)

    @property
    def num_nodes(self) -> int:  # model-facing row count per device
        return self.n_local

    @property
    def ext_rows(self) -> int:
        return self.n_local + 2 * self.halo

    def local_block_ell(self) -> BlockEllGraph:
        return BlockEllGraph(
            nbr=self.nbr,
            nbr_weight=self.nbr_weight,
            window_start=self.window_start,
            num_nodes=self.n_local,
            num_edges=self.num_edges,
            block_size=self.block_size,
            window_size=self.window_size,
            num_src_rows=self.ext_rows,
        )


def halo_exchange(x: Array, halo: int, axis_name: str) -> Array:
    """Bidirectional ring exchange of boundary rows; returns the extended
    array ``[left-halo | x | right-halo]`` along the node axis (-2)."""
    num = jax.lax.axis_size(axis_name)
    if halo == 0 or num == 1:
        left = jnp.zeros_like(x[..., :halo, :])
        right = jnp.zeros_like(x[..., :halo, :])
        return jnp.concatenate([left, x, right], axis=-2)
    fwd = [(i, (i + 1) % num) for i in range(num)]
    bwd = [(i, (i - 1) % num) for i in range(num)]
    # Receive the left neighbor's last rows and the right neighbor's first rows.
    from_left = jax.lax.ppermute(x[..., -halo:, :], axis_name, perm=fwd)
    from_right = jax.lax.ppermute(x[..., :halo, :], axis_name, perm=bwd)
    return jnp.concatenate([from_left, x, from_right], axis=-2)


def aggregate_halo(graph: HaloGraph, x: Array, backend: str = "auto") -> Array:
    """Exchange halos, aggregate locally, return local rows.

    The ring wraps, so the first/last partitions receive wrapped rows — but no
    edge references them (indices were built from the acyclic node ordering),
    so they are inert.

    Differentiation: the composite (exchange → local aggregate → crop) is,
    globally, multiplication by the padded normalized adjacency — symmetric
    for the undirected GCN-normalized graphs this framework builds — so the
    VJP w.r.t. ``x`` is the SAME halo aggregation applied to the cotangent.
    The custom VJP lives HERE, at the composite level, because the local
    scatter matrix is (n_local × ext) non-square: the Pallas kernels' own
    backward-reuses-forward VJPs are only valid for square symmetric S and
    must not be relied on inside the halo path.
    """
    if x.shape[-2] != graph.n_local:
        raise ValueError(f"x has {x.shape[-2]} rows, partition has {graph.n_local}")
    return _aggregate_halo_sym(graph, x, backend)


def _zero_cotangent(leaf):
    # Integer/bool primals take float0 cotangents; float table cotangents are
    # symbolic zeros that XLA DCEs (the graph tables are never differentiated).
    if jnp.issubdtype(leaf.dtype, jnp.integer) or leaf.dtype == jnp.bool_:
        return np.zeros(leaf.shape, jax.dtypes.float0)
    return jnp.zeros_like(leaf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _aggregate_halo_sym(graph: HaloGraph, x: Array, backend: str) -> Array:
    return _aggregate_halo_impl(graph, x, backend)


def _aggregate_halo_fwd(graph, x, backend):
    return _aggregate_halo_impl(graph, x, backend), graph


def _aggregate_halo_bwd(backend, graph, g):
    gx = _aggregate_halo_impl(graph, g, backend)
    return (jax.tree_util.tree_map(_zero_cotangent, graph), gx)


_aggregate_halo_sym.defvjp(_aggregate_halo_fwd, _aggregate_halo_bwd)


def _aggregate_halo_impl(graph: HaloGraph, x: Array, backend: str) -> Array:
    x_ext = halo_exchange(x, graph.halo, graph.axis_name)
    on_tpu = jax.default_backend() == "tpu"
    if graph.delta_blocks is not None:
        # Sliding-ring streamed-S local kernel (v4, the flagship layout).
        from gwen_tpu.graph.graph import SlidingDenseGraph

        sd = SlidingDenseGraph(
            s_mat=graph.s_mat,
            window_start=graph.window_start,
            delta_blocks=graph.delta_blocks,
            num_nodes=graph.n_local,
            num_edges=graph.num_edges,
            block_size=graph.block_size,
            window_size=graph.window_size,
            max_delta_blocks=graph.max_delta,
            num_src_rows=graph.ext_rows,
        )
        if backend in ("auto", "pallas") and on_tpu:
            from gwen_tpu.ops.spmm_pallas import spmm_sliding_dense

            out = spmm_sliding_dense(sd, x_ext)
        else:
            from gwen_tpu.ops.aggregate import aggregate_sliding_dense_reference

            out = aggregate_sliding_dense_reference(sd, x_ext)
    elif graph.s_mat is not None:
        from gwen_tpu.graph.graph import WindowedDenseGraph

        wd = WindowedDenseGraph(
            s_mat=graph.s_mat,
            window_start=graph.window_start,
            num_nodes=graph.n_local,
            num_edges=graph.num_edges,
            block_size=graph.block_size,
            num_src_rows=graph.ext_rows,
        )
        if backend in ("auto", "pallas"):
            from gwen_tpu.ops.spmm_pallas import spmm_windowed_dense

            out = spmm_windowed_dense(wd, x_ext)
        else:
            from gwen_tpu.ops.aggregate import aggregate_windowed_dense_reference

            out = aggregate_windowed_dense_reference(wd, x_ext)
    elif backend in ("auto", "pallas") and on_tpu:
        from gwen_tpu.ops.spmm_pallas import spmm_block_ell

        out = spmm_block_ell(graph.local_block_ell(), x_ext)
    else:
        from gwen_tpu.ops.aggregate import aggregate_block_ell_reference

        out = aggregate_block_ell_reference(graph.local_block_ell(), x_ext)
    return out[..., : graph.n_local, :]
