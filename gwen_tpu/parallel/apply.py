"""shard_map wiring: run a GNN model over a partitioned mesh graph.

``make_partitioned_apply`` wraps ``model.apply`` in ``jax.shard_map`` over the
(data, graph) mesh: node features are sharded over the ``graph`` axis (each
device holds its contiguous partition), batch over ``data``, params
replicated. Inside the mapped function each device reconstructs its local
:class:`~gwen_tpu.parallel.halo.HaloGraph` from the stacked partition tables
and runs the unchanged model — halo ppermutes happen inside
``gwen_tpu.ops.aggregate`` dispatch, overlapped/scheduled by XLA.

This replaces the reference's DDP+NCCL single-axis data parallelism
(models_cnn.py:510) and adds the graph axis it never had (SURVEY §2.3).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gwen_tpu.parallel.halo import HaloGraph
from gwen_tpu.parallel.partition import PartitionedGraph


def make_partitioned_apply(
    model,
    pg: PartitionedGraph,
    mesh: Mesh,
    data_axis: str = "data",
    graph_axis: str = "graph",
) -> Callable:
    """Returns ``apply(params, x)`` for global ``x (..., P*n_local, F)``.

    The result is jit-compatible; batch (leading) axis is sharded over
    ``data_axis`` when present, node axis over ``graph_axis``.
    """
    max_edges = int(pg.edges_per_part.max()) if pg.num_parts else 0
    sliding = pg.layout == "sliding" and pg.s_sliding is not None

    if sliding:
        # Flagship v4 layout: ring-S + monotonic starts + per-block deltas.
        tables = (
            jnp.asarray(pg.sliding_window_start),
            jnp.asarray(pg.sliding_delta),
            jnp.asarray(pg.s_sliding),
        )

        def local_apply(ws_p, delta_p, s_p, params, x):
            hg = HaloGraph(
                nbr=jnp.zeros((pg.n_local, 1), jnp.int32),  # unused by v4
                nbr_weight=jnp.zeros((pg.n_local, 1), s_p.dtype),
                window_start=ws_p[0],
                axis_name=graph_axis,
                halo=pg.halo,
                n_local=pg.n_local,
                block_size=pg.block_size,
                window_size=pg.sliding_window,
                num_edges=max_edges,
                s_mat=s_p[0],
                delta_blocks=delta_p[0],
                ring_rows=pg.sliding_ring,
                max_delta=pg.sliding_max_delta,
            )
            return model.apply(params, hg, x)
    else:
        has_dense_s = pg.s_dense is not None
        tables = (
            jnp.asarray(pg.nbr),
            jnp.asarray(pg.nbr_weight),
            jnp.asarray(pg.window_start),
        ) + ((jnp.asarray(pg.s_dense),) if has_dense_s else ())

        def local_apply(nbr_p, nbr_w_p, wstart_p, *rest):
            *s_p, params, x = rest
            hg = HaloGraph(
                nbr=nbr_p[0],
                nbr_weight=nbr_w_p[0],
                window_start=wstart_p[0],
                axis_name=graph_axis,
                halo=pg.halo,
                n_local=pg.n_local,
                block_size=pg.block_size,
                window_size=pg.window_size,
                num_edges=max_edges,
                s_mat=s_p[0][0] if s_p else None,
            )
            return model.apply(params, hg, x)

    def x_spec(ndim: int) -> P:
        spec = [None] * ndim
        spec[-2] = graph_axis
        if ndim >= 3:
            spec[0] = data_axis
        return P(*spec)

    def apply(params, x, tables_arg=None):
        """``tables_arg`` lets callers thread the partition tables through a
        jit boundary as arguments (mesh-scale-safe; defaults to the captured
        tables, fine for small graphs)."""
        t = tables if tables_arg is None else tables_arg
        table_specs = tuple(P(graph_axis) for _ in t)
        mapped = jax.shard_map(
            local_apply,
            mesh=mesh,
            in_specs=table_specs + (P(), x_spec(x.ndim)),
            out_specs=x_spec(x.ndim),
            check_vma=False,
        )
        return mapped(*t, params, x)

    apply.tables = tables
    return apply
