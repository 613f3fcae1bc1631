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


@struct.dataclass
class HaloDiagGraph:
    """Per-device partition of the GLOBAL diagonal-window (v6) layout.

    Local aggregation = halo exchange (halo = window, O(1) in mesh size —
    vs the O(√N) bandwidth halos of the RCM layouts) + the diag superblock
    kernel over the halo-extended rows. Escape edges (~2% under the
    KD-patch ordering) ride the hierarchical contraction *globally*: each
    device extracts its slice of the U boundary-skeleton rows, one
    ``all_gather`` over the graph axis rebuilds the compacted x, the
    banded c2 sliding sub-kernel runs replicated (it is tiny), and each
    device gathers + places its fix slice in-kernel (one-hot MXU matmul).
    """

    offsets: Array  # (n_local // block,) int32 — ws − xbase, ext-relative
    xbase: Array  # (blocks // superblock,) int32 — superblock buffer start
    s_mat: Array  # (n_local, W)
    axis_name: str = struct.field(pytree_node=False)
    halo: int = struct.field(pytree_node=False)
    n_local: int = struct.field(pytree_node=False)
    block_size: int = struct.field(pytree_node=False)
    window_size: int = struct.field(pytree_node=False)
    superblock: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)
    # Escape machinery (None/0 when the window covers every edge):
    esc_start: "Array | None" = None  # (superblocks,) int32 — union fix
    #   slice start per superblock (sb-level placement, see DiagWindowGraph)
    esc_lrow: "Array | None" = None  # (blocks, cnt_pad) int32 — sb-relative
    loc_idx: "Array | None" = None  # (U_pp,) int32 — local x rows to extract
    back_loc: "Array | None" = None  # (U_pp,) int32 — c2 row per fix row
    idx2: "Array | None" = None  # (U,) int32 — gathered-layout row per c2 row
    esc2: "object | None" = None  # replicated c2-space SlidingDenseGraph
    cnt_pad: int = struct.field(pytree_node=False, default=0)
    u_pp: int = struct.field(pytree_node=False, default=0)
    # Transpose coverage ranges over the halo-extended source blocks
    # (windowed attention backward; see graph.diag_transpose_tables):
    t_lo: "Array | None" = None  # (ext_rows // block,) int32
    t_cnt: "Array | None" = None  # (ext_rows // block,) int32
    t_max: int = struct.field(pytree_node=False, default=0)

    @property
    def num_nodes(self) -> int:  # model-facing row count per device
        return self.n_local

    @property
    def ext_rows(self) -> int:
        return self.n_local + 2 * self.halo


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


def _diag_halo_fix(graph: "HaloDiagGraph", x: Array) -> "Array | None":
    """Escape fix rows for this device's receivers (placement order):
    extract local boundary-skeleton rows → ``all_gather`` over the graph
    axis → banded c2 contraction (replicated, tiny) → gather back this
    device's slice."""
    if graph.esc_start is None:
        return None
    node_ax = x.ndim - 2
    xc_loc = jnp.take(x, graph.loc_idx, axis=node_ax)
    xc_all = jax.lax.all_gather(
        xc_loc, graph.axis_name, axis=node_ax, tiled=True
    )
    xc2 = jnp.take(xc_all, graph.idx2, axis=node_ax)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from gwen_tpu.ops.spmm_pallas import spmm_sliding_dense

        fixc2 = spmm_sliding_dense(graph.esc2, xc2)
    else:
        from gwen_tpu.ops.aggregate import aggregate_sliding_dense_reference

        fixc2 = aggregate_sliding_dense_reference(graph.esc2, xc2)
    return jnp.take(fixc2, graph.back_loc, axis=node_ax).astype(x.dtype)


def _diag_halo_local(graph: "HaloDiagGraph", x_ext: Array,
                     fix: "Array | None") -> Array:
    """Local diag-window kernel over the halo-extended rows (Pallas)."""
    from gwen_tpu.ops.spmm_pallas import (
        _SLIDING_RING_VMEM_BYTES,
        _diag_impl,
        _diag_impl_b,
        _round_up as _ru,
    )

    leading = x_ext.shape[:-2]
    f = x_ext.shape[-1]
    f_pad = _ru(f, 128)
    itemsize = jnp.dtype(x_ext.dtype).itemsize
    buf = graph.window_size + (graph.superblock - 1) * graph.block_size
    row_cost = 2 * buf + (
        2 * graph.cnt_pad if fix is not None else 0
    )
    w_budget = _SLIDING_RING_VMEM_BYTES // (row_cost * itemsize)
    w_chunk = min(max((w_budget // 128) * 128, 128), f_pad)

    if leading:
        # Batched: one 2-D-grid kernel call, S tile streamed once per
        # superblock and reused across the batch (was a per-sample Python
        # loop — B dispatches and B× S traffic).
        xb = x_ext.reshape((-1,) + x_ext.shape[-2:])
        nb = xb.shape[0]
        xp = jnp.zeros((nb, graph.ext_rows, f_pad), x_ext.dtype)
        xp = xp.at[:, :, :f].set(xb)
        fp = None
        if fix is not None:
            fb = fix.reshape((-1,) + fix.shape[-2:])
            fp = jnp.zeros((nb, fb.shape[1], f_pad), x_ext.dtype)
            fp = fp.at[:, :, :f].set(fb.astype(x_ext.dtype))
        impl = _diag_impl_b
    else:
        xp = jnp.zeros((graph.ext_rows, f_pad), x_ext.dtype)
        xp = xp.at[:, :f].set(x_ext)
        fp = None
        if fix is not None:
            fp = jnp.zeros((fix.shape[0], f_pad), x_ext.dtype)
            fp = fp.at[:, :f].set(fix.astype(x_ext.dtype))
        impl = _diag_impl

    outs = []
    for c0 in range(0, f_pad, w_chunk):
        wc = min(w_chunk, f_pad - c0)
        outs.append(impl(
            graph.offsets, graph.xbase, graph.esc_start, graph.s_mat,
            graph.esc_lrow, None if fp is None else fp[..., c0:c0 + wc],
            xp[..., c0:c0 + wc],
            graph.block_size, graph.window_size, graph.superblock,
            graph.cnt_pad if fp is not None else 0,
        ))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    out = out[..., :f]
    if leading:
        out = out.reshape(leading + out.shape[-2:])
    return out


def _diag_halo_reference(graph: "HaloDiagGraph", x_ext: Array,
                         fix: "Array | None") -> Array:
    """jnp reference for the local diag kernel (CPU mesh tests)."""
    bs = graph.block_size
    w = graph.window_size
    nb = graph.n_local // bs
    s_blocks = graph.s_mat.reshape(nb, bs, w)
    outs = []
    for b in range(nb):
        start = graph.xbase[b // graph.superblock] + graph.offsets[b]
        win = jax.lax.dynamic_slice_in_dim(x_ext, start, w, axis=-2)
        acc = jnp.einsum(
            "bw,...wf->...bf", s_blocks[b].astype(x_ext.dtype), win
        )
        if fix is not None:
            fr = jax.lax.dynamic_slice_in_dim(
                fix, graph.esc_start[b // graph.superblock], graph.cnt_pad,
                axis=-2,
            )
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (bs, graph.cnt_pad), 0)
                == graph.esc_lrow[b][None, :]
            ).astype(x_ext.dtype)
            acc = acc + jnp.einsum("bu,...uf->...bf", onehot, fr)
        outs.append(acc)
    return jnp.concatenate(outs, axis=-2)


def _aggregate_halo_impl(graph, x: Array, backend: str) -> Array:
    x_ext = halo_exchange(x, graph.halo, graph.axis_name)
    on_tpu = jax.default_backend() == "tpu"
    if isinstance(graph, HaloDiagGraph):
        fix = _diag_halo_fix(graph, x)
        if backend in ("auto", "pallas") and on_tpu:
            out = _diag_halo_local(graph, x_ext, fix)
        else:
            out = _diag_halo_reference(graph, x_ext, fix)
        return out[..., : graph.n_local, :]
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


# ---------------------------------------------- partitioned attention


def _attn_halo_kernel(graph: HaloDiagGraph, q: Array, k_ext: Array,
                      v_ext: Array, scale: float,
                      pack: bool = False) -> Array:
    """Fused attention kernel over the halo-extended K/V (Pallas)."""
    from gwen_tpu.ops.attention_pallas import _attn_fused_diff, _pad_rows
    from gwen_tpu.ops.spmm_pallas import _round_up as _ru

    leading = q.shape[:-2]
    f = q.shape[-1]
    f_pad = _ru(f, 128)
    # Leading dims (batch, folded heads) ride the batched fused kernel in
    # one call — the S-mask tile streams once per superblock and is reused
    # across the batch (was a per-sample Python loop).
    to_b = leading or pack
    qp = _pad_rows(q.reshape((-1,) + q.shape[-2:]) if to_b else q,
                   graph.n_local, f_pad)
    kp = _pad_rows(k_ext.reshape((-1,) + k_ext.shape[-2:]) if to_b
                   else k_ext, graph.ext_rows, f_pad)
    vp = _pad_rows(v_ext.reshape((-1,) + v_ext.shape[-2:]) if to_b
                   else v_ext, graph.ext_rows, f_pad)
    out = _attn_fused_diff(
        graph.offsets, graph.xbase, graph.s_mat, graph.t_lo, graph.t_cnt,
        qp, kp, vp, graph.block_size, graph.window_size, graph.superblock,
        graph.t_max, float(scale), pack,
    )
    if pack and not leading:
        out = out[0]
    out = out[..., :f]
    if leading:
        out = out.reshape(leading + out.shape[-2:])
    return out


def _attn_halo_reference(graph: HaloDiagGraph, q: Array, k_ext: Array,
                         v_ext: Array, scale: float) -> Array:
    """jnp reference for the partitioned attention (CPU mesh tests)."""
    bs, w = graph.block_size, graph.window_size
    nb = graph.n_local // bs
    s_blocks = graph.s_mat.reshape(nb, bs, w)
    outs = []
    for b in range(nb):
        start = graph.xbase[b // graph.superblock] + graph.offsets[b]
        kw = jax.lax.dynamic_slice_in_dim(k_ext, start, w, axis=-2)
        vw = jax.lax.dynamic_slice_in_dim(v_ext, start, w, axis=-2)
        q_b = q[..., b * bs:(b + 1) * bs, :]
        scores = jnp.einsum(
            "...bf,...wf->...bw",
            q_b.astype(jnp.float32), kw.astype(jnp.float32),
        ) * jnp.float32(scale)
        mask = s_blocks[b] != 0
        logits = jnp.where(mask, scores, jnp.float32(-1e30))
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx) * mask
        den = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.where(den == 0, 1.0, den)
        outs.append(jnp.einsum(
            "...bw,...wf->...bf", p.astype(v_ext.dtype), vw,
        ))
    return jnp.concatenate(outs, axis=-2)


def attend_halo(graph: HaloDiagGraph, q: Array, k: Array, v: Array, *,
                scale: "float | None" = None, backend: str = "auto",
                pack: bool = False) -> Array:
    """Windowed attention over a partitioned diag layout.

    Each destination's in-window neighbourhood is fully contained in the
    halo-extended local array (halo = window), so partitioned attention is
    two halo ring exchanges (K, V) + the local fused kernel — and, unlike
    the GCN path, there is no escape term at all (windowed attention
    excludes out-of-window edges by definition, identically on the global
    layout). Differentiation composes: the fused kernel's flash-style VJP
    produces local dK/dV on the extended rows, and autodiff of the
    ``ppermute``-based exchange routes halo cotangents back to their
    owners.
    """
    if q.shape[-2] != graph.n_local:
        raise ValueError(
            f"q has {q.shape[-2]} rows, partition has {graph.n_local}")
    f = q.shape[-1]
    if pack and scale is None:
        raise ValueError("pack=True needs an explicit scale "
                         "(1/sqrt(dh) of the true head width)")
    if scale is None:
        scale = 1.0 / (f ** 0.5)
    k_ext = halo_exchange(k, graph.halo, graph.axis_name)
    v_ext = halo_exchange(v, graph.halo, graph.axis_name)
    on_tpu = jax.default_backend() == "tpu"
    if backend in ("auto", "pallas") and on_tpu:
        if graph.t_max == 0:
            raise ValueError(
                "attend_halo needs transpose tables — rebuild the "
                "partition with partition_graph(layout='diag') (recent "
                "builds emit diag_t_lo/diag_t_cnt)"
            )
        return _attn_halo_kernel(graph, q, k_ext, v_ext, scale, pack)
    if pack:
        # Lane-packed sub-heads on the reference path: run each 64-lane
        # half as an ordinary head (exact — the packed kernels contract
        # each sub-head only against its own zero-padded lanes).
        outs = [
            _attn_halo_reference(graph, q[..., s], k_ext[..., s],
                                 v_ext[..., s], scale)
            for s in (slice(0, 64), slice(64, 128))
        ]
        return jnp.concatenate(outs, axis=-1)
    return _attn_halo_reference(graph, q, k_ext, v_ext, scale)
