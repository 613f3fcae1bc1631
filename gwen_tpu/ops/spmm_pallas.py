"""Pallas TPU SpMM: fused gather-MMA-scatter neighborhood aggregation.

This is the framework's core kernel, replacing torch-scatter/torch-sparse
CUDA scatter ops behind the reference's ``GCNConv`` (SURVEY §2.2). Semantics
match ``aggregate_segment``: ``out[r] = Σ_e w_e · x[s_e]``.

Design (TPU-first, see BlockEllGraph in ``gwen_tpu.graph.graph``):

* Nodes are RCM-ordered so each 128-row destination block's sources fall in a
  bounded, 128-aligned *window* of source rows (graph bandwidth → window
  size). The kernel async-DMAs the window from HBM into VMEM once per block —
  large contiguous transfers instead of per-edge random access.
* While the DMA is in flight, the VPU builds a scatter matrix
  ``S[b, j] = Σ_d 1[nbr[b,d] == j] · w[b,d]`` from the padded per-node
  neighbor lists (one compare+select per degree slot — mesh graphs have
  near-uniform degree ≈ 7, padded to 8).
* The aggregation is then a single MXU matmul ``out_block = S @ window``.
  One-hot-matmul turns data-dependent gather/scatter into dense MXU work,
  which is exactly what the TPU wants at mesh degrees.
* Feature axis is tiled (``F_BLK``) so wide layers stay within VMEM.

Backward: with symmetric normalized adjacency (undirected graph + GCN norm),
``A^T = A``, so the VJP reuses the same kernel on the cotangent. Batched
inputs ``(..., N, F)`` are folded into the feature axis — aggregation is
node-wise linear, so batching is free and avoids vmapping the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gwen_tpu.graph.graph import BlockEllGraph

Array = jnp.ndarray

def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests, SURVEY §4)."""
    return jax.default_backend() != "tpu"


def _kernel(win_start_ref, nbr_ref, w_ref, x_hbm, out_ref, xw, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    f_blk = xw.shape[1]
    window = xw.shape[0]
    block = nbr_ref.shape[0]
    degree = nbr_ref.shape[1]

    # Window starts are block-aligned by construction (graph.ell_tables);
    # Mosaic needs the hint to prove the slice is tile-divisible.
    start = pl.multiple_of(win_start_ref[i], block)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, window), pl.ds(j * f_blk, f_blk)],
        xw,
        sem,
    )
    dma.start()

    # Build the scatter matrix while the window streams in.
    col = jax.lax.broadcasted_iota(jnp.int32, (block, window), 1)
    s_mat = jnp.zeros((block, window), jnp.float32)
    for d in range(degree):
        idx = nbr_ref[:, d][:, None]
        wgt = w_ref[:, d][:, None]
        s_mat = s_mat + jnp.where(col == idx, wgt, 0.0)

    dma.wait()
    # Full f32 precision for f32 inputs (bf16 MXU passes otherwise lose ~1e-2
    # relative); bf16 inputs take the fast path — the kernel is HBM-bound, so
    # the extra MXU passes are hidden behind the window DMA.
    precision = (
        jax.lax.Precision.HIGHEST if xw.dtype == jnp.float32 else None
    )
    out_ref[:] = jnp.dot(
        s_mat.astype(xw.dtype), xw[:],
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _spmm_impl(nbr, nbr_w, win_start, x_pad, block, window, f_blk):
    n_pad, f_pad = x_pad.shape
    num_blocks = nbr.shape[0] // block
    grid = (num_blocks, f_pad // f_blk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, nbr.shape[1]), lambda i, j, ws: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nbr.shape[1]), lambda i, j, ws: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; DMA'd
        ],
        out_specs=pl.BlockSpec((block, f_blk), lambda i, j, ws: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window, f_blk), x_pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    edges_bytes = nbr.size * 8
    flops = 2 * nbr.shape[0] * window * f_pad
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr.shape[0], f_pad), x_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_pad.size * x_pad.dtype.itemsize * (window // block)
            + edges_bytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(win_start, nbr, nbr_w, x_pad)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def spmm_block_ell(graph: BlockEllGraph, x: Array, f_blk: int = 512) -> Array:
    """Aggregate ``x`` (..., N, F) over the blocked-ELL graph with the Pallas
    kernel. Differentiable (symmetric adjacency ⇒ backward reuses forward)."""
    leading = x.shape[:-2]
    n, f = x.shape[-2], x.shape[-1]
    n_pad = graph.num_padded_nodes
    src_rows = graph.src_rows
    if n not in (graph.num_nodes, n_pad, src_rows):
        raise ValueError(
            f"x has {n} node rows; graph expects {graph.num_nodes} "
            f"({n_pad} padded dst, {src_rows} src)"
        )
    # Output row count: mirror the input's padding policy for plain graphs;
    # halo-extended sources always produce the padded destination rows.
    out_rows = n if src_rows == n_pad else n_pad

    # Fold leading batch dims into features: aggregation is node-wise linear.
    if leading:
        xm = jnp.moveaxis(x.reshape((-1,) + x.shape[-2:]), 0, -1)  # (N, F, B)
        xm = xm.reshape(n, -1)
    else:
        xm = x

    fold = xm.shape[1]
    f_pad = _round_up(fold, 128)
    f_blk_eff = min(f_blk, f_pad)
    while f_pad % f_blk_eff:
        f_blk_eff -= 128
    xp = jnp.zeros((src_rows, f_pad), xm.dtype)
    xp = xp.at[: xm.shape[0], :fold].set(xm)

    out = _spmm_diff(graph.nbr, graph.nbr_weight, graph.window_start, xp,
                     graph.block_size, graph.window_size, f_blk_eff)

    out = out[:out_rows, :fold]
    if leading:
        out = out.reshape(out_rows, f, -1)
        out = jnp.moveaxis(out, -1, 0).reshape(leading + (out_rows, f))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _spmm_diff(nbr, nbr_w, win_start, xp, block, window, f_blk):
    return _spmm_impl(nbr, nbr_w, win_start, xp, block, window, f_blk)


def _spmm_fwd(nbr, nbr_w, win_start, xp, block, window, f_blk):
    out = _spmm_impl(nbr, nbr_w, win_start, xp, block, window, f_blk)
    return out, (nbr, nbr_w, win_start)


def _spmm_bwd(block, window, f_blk, res, g):
    nbr, nbr_w, win_start = res
    # Symmetric normalized adjacency: A^T = A, so the cotangent w.r.t. x is
    # the same aggregation applied to g. Graph arrays get zero cotangents.
    gx = _spmm_impl(nbr, nbr_w, win_start, g.astype(nbr_w.dtype), block, window, f_blk)
    return (None, None, None, gx.astype(g.dtype))


_spmm_diff.defvjp(_spmm_fwd, _spmm_bwd)


# ----------------------------------------------------------- tile (BSR) kernel


def _tile_kernel(tiles_max, tile_degree, tile_idx_ref, n_active_ref, tnbr_ref,
                 tw_ref, x_hbm, out_ref, xtiles, acc, sems):
    i = pl.program_id(0)
    j = pl.program_id(1)
    block = tnbr_ref.shape[0]
    f_blk = xtiles.shape[2]
    nact = n_active_ref[i]

    def tile_dma(t):
        src = pl.multiple_of(tile_idx_ref[i, t] * block, block)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, block), pl.ds(j * f_blk, f_blk)],
            xtiles.at[t],
            sems.at[t],
        )

    # Launch all active-tile DMAs up front; they proceed while the VPU builds
    # the per-tile scatter matrices below.
    for t in range(tiles_max):
        @pl.when(t < nact)
        def _(t=t):
            tile_dma(t).start()

    col = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    acc[:] = jnp.zeros_like(acc)
    for t in range(tiles_max):
        s_mat = jnp.zeros((block, block), jnp.float32)
        for d in range(tile_degree):
            k = t * tile_degree + d
            idx = tnbr_ref[:, k][:, None]
            wgt = tw_ref[:, k][:, None]
            s_mat = s_mat + jnp.where(col == idx, wgt, 0.0)

        @pl.when(t < nact)
        def _(t=t, s_mat=s_mat):
            tile_dma(t).wait()
            prec = (
                jax.lax.Precision.HIGHEST
                if xtiles.dtype == jnp.float32
                else None
            )
            acc[:] += jnp.dot(
                s_mat.astype(xtiles.dtype), xtiles[t],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
    out_ref[:] = acc[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _spmm_tiles_impl(tile_idx, n_active, tnbr, tw, x_pad, block, tiles_max,
                     tile_degree, f_blk):
    n_pad, f_pad = x_pad.shape
    num_blocks = tnbr.shape[0] // block
    grid = (num_blocks, f_pad // f_blk)
    flat = tnbr.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_idx, n_active
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, flat), lambda i, j, ti, na: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, flat), lambda i, j, ti, na: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; DMA'd
        ],
        out_specs=pl.BlockSpec((block, f_blk), lambda i, j, ti, na: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tiles_max, block, f_blk), x_pad.dtype),
            pltpu.VMEM((block, f_blk), jnp.float32),
            pltpu.SemaphoreType.DMA((tiles_max,)),
        ],
    )
    kernel = functools.partial(_tile_kernel, tiles_max, tile_degree)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tnbr.shape[0], f_pad), x_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * tnbr.shape[0] * tiles_max * block * f_pad,
            bytes_accessed=num_blocks * tiles_max * block * f_pad
            * x_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(tile_idx, n_active, tnbr, tw, x_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _spmm_tiles_diff(tile_idx, n_active, tnbr, tw, xp, block, tiles_max,
                     tile_degree, f_blk):
    return _spmm_tiles_impl(tile_idx, n_active, tnbr, tw, xp, block, tiles_max,
                            tile_degree, f_blk)


def _spmm_tiles_fwd(tile_idx, n_active, tnbr, tw, xp, block, tiles_max,
                    tile_degree, f_blk):
    out = _spmm_tiles_impl(tile_idx, n_active, tnbr, tw, xp, block, tiles_max,
                           tile_degree, f_blk)
    return out, (tile_idx, n_active, tnbr, tw)


def _spmm_tiles_bwd(block, tiles_max, tile_degree, f_blk, res, g):
    tile_idx, n_active, tnbr, tw = res
    # Symmetric normalized adjacency: backward reuses the forward kernel.
    gx = _spmm_tiles_impl(tile_idx, n_active, tnbr, tw, g.astype(tw.dtype),
                          block, tiles_max, tile_degree, f_blk)
    return (None, None, None, None, gx.astype(g.dtype))


_spmm_tiles_diff.defvjp(_spmm_tiles_fwd, _spmm_tiles_bwd)


def spmm_block_tiles(graph, x: Array, f_blk: int = 512) -> Array:
    """Tile-based (BSR) Pallas aggregation over ``(..., N, F)``; the v2 kernel
    — HBM traffic and MXU work scale with *active* source tiles instead of
    the bandwidth window. Differentiable; batched dims fold into features."""
    from gwen_tpu.graph.graph import BlockTileGraph

    assert isinstance(graph, BlockTileGraph)
    leading = x.shape[:-2]
    n, f = x.shape[-2], x.shape[-1]
    n_pad = graph.num_padded_nodes
    src_rows = graph.num_src_rows
    if n not in (graph.num_nodes, n_pad, src_rows):
        raise ValueError(
            f"x has {n} node rows; graph expects {graph.num_nodes} "
            f"({n_pad} padded dst, {src_rows} src)"
        )
    out_rows = n if src_rows == n_pad else n_pad
    if leading:
        xm = jnp.moveaxis(x.reshape((-1,) + x.shape[-2:]), 0, -1)
        xm = xm.reshape(n, -1)
    else:
        xm = x
    fold = xm.shape[1]
    f_pad = _round_up(fold, 128)
    f_blk_eff = min(f_blk, f_pad)
    while f_pad % f_blk_eff:
        f_blk_eff -= 128
    xp = jnp.zeros((src_rows, f_pad), xm.dtype)
    xp = xp.at[: xm.shape[0], :fold].set(xm)

    out = _spmm_tiles_diff(
        graph.tile_idx, graph.n_active, graph.tnbr, graph.tw, xp,
        graph.block_size, graph.tiles_max, graph.tile_degree, f_blk_eff,
    )
    out = out[:out_rows, :fold]
    if leading:
        out = out.reshape(out_rows, f, -1)
        out = jnp.moveaxis(out, -1, 0).reshape(leading + (out_rows, f))
    return out


# ------------------------------------------------------- streamed-S kernel (v3)


def _sdense_kernel(ws_ref, s_ref, x_hbm, out_ref, xw, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    f_blk = xw.shape[1]
    window = xw.shape[0]
    block = s_ref.shape[0]

    start = pl.multiple_of(ws_ref[i], block)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, window), pl.ds(j * f_blk, f_blk)],
        xw,
        sem,
    )
    dma.start()
    # S streams in via its BlockSpec (auto double-buffered); the window DMA
    # overlaps the previous block's matmul in the pallas pipeline.
    dma.wait()
    prec = jax.lax.Precision.HIGHEST if xw.dtype == jnp.float32 else None
    out_ref[:] = jnp.dot(
        s_ref[:].astype(xw.dtype), xw[:],
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _sdense_impl(ws, s_mat, x_pad, block, window, f_blk):
    n_pad_dst = s_mat.shape[0]
    f_pad = x_pad.shape[1]
    grid = (n_pad_dst // block, f_pad // f_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, window), lambda i, j, ws_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x in HBM; window DMA'd
        ],
        out_specs=pl.BlockSpec((block, f_blk), lambda i, j, ws_: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window, f_blk), x_pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _sdense_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad_dst, f_pad), x_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad_dst * window * f_pad,
            bytes_accessed=(
                s_mat.size * s_mat.dtype.itemsize
                + (n_pad_dst // block) * window * f_pad * x_pad.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(ws, s_mat, x_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _sdense_diff(ws, s_mat, xp, block, window, f_blk):
    return _sdense_impl(ws, s_mat, xp, block, window, f_blk)


def _sdense_fwd(ws, s_mat, xp, block, window, f_blk):
    return _sdense_impl(ws, s_mat, xp, block, window, f_blk), (ws, s_mat)


def _sdense_bwd(block, window, f_blk, res, g):
    ws, s_mat = res
    # Symmetric adjacency: backward reuses the forward kernel on the
    # cotangent (same dtype as the forward output).
    gx = _sdense_impl(ws, s_mat, g, block, window, f_blk)
    return (None, None, gx)


_sdense_diff.defvjp(_sdense_fwd, _sdense_bwd)


def spmm_windowed_dense(graph, x: Array, f_blk: int = 512) -> Array:
    """Streamed-S aggregation (v3): one MXU matmul per (block, f-tile) with
    the precomputed scatter matrix streamed from HBM. Fastest kernel; costs
    ``N_pad × window`` HBM memory for S."""
    from gwen_tpu.graph.graph import WindowedDenseGraph

    assert isinstance(graph, WindowedDenseGraph)
    leading = x.shape[:-2]
    n, f = x.shape[-2], x.shape[-1]
    n_pad = graph.num_padded_nodes
    src_rows = graph.num_src_rows
    if n not in (graph.num_nodes, n_pad, src_rows):
        raise ValueError(
            f"x has {n} node rows; graph expects {graph.num_nodes} "
            f"({n_pad} padded dst, {src_rows} src)"
        )
    out_rows = n if src_rows == n_pad else n_pad
    if leading:
        xm = jnp.moveaxis(x.reshape((-1,) + x.shape[-2:]), 0, -1)
        xm = xm.reshape(n, -1)
    else:
        xm = x
    fold = xm.shape[1]
    f_pad = _round_up(fold, 128)
    f_blk_eff = min(f_blk, f_pad)
    while f_pad % f_blk_eff:
        f_blk_eff -= 128
    xp = jnp.zeros((src_rows, f_pad), xm.dtype)
    xp = xp.at[: xm.shape[0], :fold].set(xm)

    out = _sdense_diff(graph.window_start, graph.s_mat, xp,
                       graph.block_size, graph.window_size, f_blk_eff)
    out = out[:out_rows, :fold]
    if leading:
        out = out.reshape(out_rows, f, -1)
        out = jnp.moveaxis(out, -1, 0).reshape(leading + (out_rows, f))
    return out


# ------------------------------------------- sliding-ring streamed-S kernel (v4)


def _sliding_kernel(window, ring_rows, max_fill, num_blocks,
                    ws_ref, db_ref, s_ref, x_hbm, out_ref, ring, sems):
    i = pl.program_id(0)  # destination block (sequential walk)
    block = s_ref.shape[0]

    def chunk(step, k):
        """DMA for 128-row chunk k of the rows step ``step`` must add.

        Covers the FULL folded feature width — the ring holds every feature
        column, so the S matrix streams exactly once per aggregation no
        matter how many batch members are folded into the feature axis
        (the wrapper chunks the width only when the ring would overflow its
        VMEM budget)."""
        base = jnp.where(step == 0, ws_ref[0],
                         ws_ref[jnp.maximum(step - 1, 0)] + window)
        src = pl.multiple_of(base + k * block, block)
        dst = pl.multiple_of(jax.lax.rem(src, ring_rows), block)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, block), :],
            ring.at[pl.ds(dst, block), :],
            sems.at[k],
        )

    # Hot-loop DMA bookkeeping is sized by max_delta (a couple of chunks),
    # not the full window — only the cold start touches max_fill descriptors.
    max_delta = max_fill[1]
    max_fill = max_fill[0]

    # Cold start: zero the ring (the matmul contracts over all ring rows;
    # never-fetched slots must be 0, not garbage), then fetch and await the
    # full first window.
    @pl.when(i == 0)
    def _():
        ring[:] = jnp.zeros_like(ring)
        for k in range(max_fill):
            @pl.when(k < db_ref[0])
            def _(k=k):
                chunk(0, k).start()
        for k in range(max_fill):
            @pl.when(k < db_ref[0])
            def _(k=k):
                chunk(0, k).wait()

    # Wait for this block's delta rows (issued at i-1).
    @pl.when(i > 0)
    def _():
        for k in range(max_delta):
            @pl.when(k < db_ref[i])
            def _(k=k):
                chunk(i, k).wait()

    # Prefetch the next block's delta rows; they only overwrite ring slots
    # holding rows below the current window (see SlidingDenseGraph proof).
    for k in range(max_delta):
        @pl.when((i + 1 < num_blocks) & (k < db_ref[jnp.minimum(i + 1, num_blocks - 1)]))
        def _(k=k):
            chunk(i + 1, k).start()

    prec = jax.lax.Precision.HIGHEST if ring.dtype == jnp.float32 else None
    out_ref[:] = jnp.dot(
        s_ref[:].astype(ring.dtype), ring[:],
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _sliding_impl(ws, db, s_mat, x_pad, block, window, ring_rows, max_delta):
    n_pad_dst = s_mat.shape[0]
    f_pad = x_pad.shape[1]
    num_blocks = n_pad_dst // block
    max_fill = (max(window // block, 1), max(max_delta, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block, ring_rows), lambda i, ws_, db_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, f_pad), lambda i, ws_, db_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ring_rows, f_pad), x_pad.dtype),
            pltpu.SemaphoreType.DMA((max_fill[0],)),
        ],
    )
    kernel = functools.partial(
        _sliding_kernel, window, ring_rows, max_fill, num_blocks
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad_dst, f_pad), x_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad_dst * ring_rows * f_pad,
            bytes_accessed=s_mat.size * s_mat.dtype.itemsize
            + x_pad.size * x_pad.dtype.itemsize
            + n_pad_dst * f_pad * x_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(ws, db, s_mat, x_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _sliding_diff(ws, db, s_mat, xp, block, window, ring_rows, max_delta):
    return _sliding_impl(ws, db, s_mat, xp, block, window, ring_rows, max_delta)


def _sliding_fwd(ws, db, s_mat, xp, block, window, ring_rows, max_delta):
    return (
        _sliding_impl(ws, db, s_mat, xp, block, window, ring_rows, max_delta),
        (ws, db, s_mat),
    )


def _sliding_bwd(block, window, ring_rows, max_delta, res, g):
    ws, db, s_mat = res
    gx = _sliding_impl(ws, db, s_mat, g, block, window, ring_rows, max_delta)
    return (None, None, None, gx.astype(g.dtype))


_sliding_diff.defvjp(_sliding_fwd, _sliding_bwd)


# Ring VMEM budget for the sliding kernel (bytes). The ring holds
# ``ring_rows × chunk_width`` elements; folded feature widths beyond the
# budget are processed in column chunks (S re-streams once per chunk).
_SLIDING_RING_VMEM_BYTES = 8 * 1024 * 1024


def _sliding_kernel_b(window, ring_rows, max_fill, num_blocks, nb,
                      ws_ref, db_ref, s_ref, x_hbm, out_ref, ring, sems):
    """Batched variant: x is (B, src, F) in HBM, the ring is (B, ring, F),
    and each destination block runs B matmuls against one streamed S tile.
    Avoids any host-side fold transpose of the batch axis — batching costs
    only extra DMA descriptors and MXU passes, never extra S traffic."""
    i = pl.program_id(0)
    block = s_ref.shape[0]

    def chunk(step, k, b):
        base = jnp.where(step == 0, ws_ref[0],
                         ws_ref[jnp.maximum(step - 1, 0)] + window)
        src = pl.multiple_of(base + k * block, block)
        dst = pl.multiple_of(jax.lax.rem(src, ring_rows), block)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src, block), :],
            ring.at[b, pl.ds(dst, block), :],
            sems.at[b, k],
        )

    max_delta = max_fill[1]
    max_fill = max_fill[0]

    @pl.when(i == 0)
    def _():
        ring[:] = jnp.zeros_like(ring)
        for b in range(nb):
            for k in range(max_fill):
                @pl.when(k < db_ref[0])
                def _(k=k, b=b):
                    chunk(0, k, b).start()
        for b in range(nb):
            for k in range(max_fill):
                @pl.when(k < db_ref[0])
                def _(k=k, b=b):
                    chunk(0, k, b).wait()

    @pl.when(i > 0)
    def _():
        for b in range(nb):
            for k in range(max_delta):
                @pl.when(k < db_ref[i])
                def _(k=k, b=b):
                    chunk(i, k, b).wait()

    for b in range(nb):
        for k in range(max_delta):
            @pl.when((i + 1 < num_blocks)
                     & (k < db_ref[jnp.minimum(i + 1, num_blocks - 1)]))
            def _(k=k, b=b):
                chunk(i + 1, k, b).start()

    prec = jax.lax.Precision.HIGHEST if ring.dtype == jnp.float32 else None
    for b in range(nb):
        out_ref[b] = jnp.dot(
            s_ref[:].astype(ring.dtype), ring[b],
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _sliding_impl_b(ws, db, s_mat, x_pad, block, window, ring_rows, max_delta):
    n_pad_dst = s_mat.shape[0]
    nb, _, f_pad = x_pad.shape
    num_blocks = n_pad_dst // block
    max_fill = (max(window // block, 1), max(max_delta, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block, ring_rows), lambda i, ws_, db_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nb, block, f_pad), lambda i, ws_, db_: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nb, ring_rows, f_pad), x_pad.dtype),
            pltpu.SemaphoreType.DMA((nb, max_fill[0])),
        ],
    )
    kernel = functools.partial(
        _sliding_kernel_b, window, ring_rows, max_fill, num_blocks, nb
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, n_pad_dst, f_pad), x_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * n_pad_dst * ring_rows * f_pad,
            bytes_accessed=s_mat.size * s_mat.dtype.itemsize
            + 2 * x_pad.size * x_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(ws, db, s_mat, x_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _sliding_diff_b(ws, db, s_mat, xp, block, window, ring_rows, max_delta):
    return _sliding_impl_b(ws, db, s_mat, xp, block, window, ring_rows, max_delta)


def _sliding_fwd_b(ws, db, s_mat, xp, block, window, ring_rows, max_delta):
    return (
        _sliding_impl_b(ws, db, s_mat, xp, block, window, ring_rows, max_delta),
        (ws, db, s_mat),
    )


def _sliding_bwd_b(block, window, ring_rows, max_delta, res, g):
    ws, db, s_mat = res
    gx = _sliding_impl_b(ws, db, s_mat, g, block, window, ring_rows, max_delta)
    return (None, None, None, gx.astype(g.dtype))


_sliding_diff_b.defvjp(_sliding_fwd_b, _sliding_bwd_b)


def _escape_rows_fix(nbr, w, x: Array) -> Array:
    """Escape contributions per unique receiver: ``x[nbr]`` + ELL
    contraction. Shapes: nbr/w (U_pad, deg), x (..., N, F) → (..., U_pad, F).
    Measured ~free at L7 (61 MB of scattered row reads, fully
    bandwidth-overlapped); the cost of the fixup is in the *placement*."""
    gathered = jnp.take(x, nbr, axis=-2)  # (..., U_pad, deg, F)
    return jnp.einsum("ud,...udf->...uf", w.astype(x.dtype), gathered)


def _escape_place(rows, fix, out: Array) -> Array:
    """Place per-unique-receiver contributions into the full output:
    ``out.at[rows].add(fix)`` — ``rows`` is strictly increasing with unique
    in-bounds entries (padding entries are out-of-bounds and dropped), so
    the scatter carries ``indices_are_sorted=unique_indices=True``. Measured
    0.27 ms vs 0.78 ms for the inverse-permutation full-N gather at L7."""
    fix = fix.astype(out.dtype)
    if out.ndim == 2:
        return out.at[rows].add(
            fix, indices_are_sorted=True, unique_indices=True, mode="drop"
        )
    return out.at[:, rows].add(
        fix, indices_are_sorted=True, unique_indices=True, mode="drop"
    )


def _escape_fix_impl(nbr, w, inv_map, x: Array) -> Array:
    """Older gather-only placement (``fix[inv_map]``), kept as the reference
    formulation for tests. Shapes: nbr/w (U_pad, deg), inv_map (N,),
    x (..., N, F) → (..., N, F)."""
    fix = _escape_rows_fix(nbr, w, x)
    return jnp.take(fix, inv_map, axis=-2)  # (..., N, F)


@jax.custom_vjp
def _escape_add_diff(nbr, w, rows, x, out):
    """``out + E @ x`` where E is the symmetric escape operator; the scatter
    placement rides inside this custom-VJP boundary so autodiff never sees
    (and never transposes) the gathers/scatters individually."""
    return _escape_place(rows, _escape_rows_fix(nbr, w, x), out)


def _escape_add_fwd(nbr, w, rows, x, out):
    return (
        _escape_add_diff(nbr, w, rows, x, out),
        (nbr, w, rows, jax.ShapeDtypeStruct(x.shape, x.dtype)),
    )


def _escape_add_bwd(res, g):
    # The escape edge set is symmetrized at build time (Eᵀ = E), so the
    # x-cotangent is the same operator applied to g; the out-cotangent is g.
    # g may have more (padded) rows than x — gathers only touch rows < N
    # and the scatter rows are < N, so both shapes work directly.
    nbr, w, rows, x_sds = res
    gx = _escape_place(
        rows,
        _escape_rows_fix(nbr, w, g),
        jnp.zeros(x_sds.shape, x_sds.dtype),
    )
    return (None, None, None, gx, g)


_escape_add_diff.defvjp(_escape_add_fwd, _escape_add_bwd)


def _sliding_escape_add(graph, x: Array, out: Array) -> Array:
    """Add the escape-window fixup (``SlidingDenseGraph.escape``): the few
    out-of-window edges, aggregated via gathers + one sorted unique-index
    scatter-add (see ``gwen_tpu.graph.graph.EscapeFixup``) on top of the
    kernel output."""
    esc = getattr(graph, "escape", None)
    if esc is None:
        return out
    leading = out.shape[:-2]
    if len(leading) > 1:  # _escape_place handles 2-D and 3-D natively
        xf = x.reshape((-1,) + x.shape[-2:])
        of = out.reshape((-1,) + out.shape[-2:])
        res = _escape_add_diff(esc.nbr, esc.w, esc.rows, xf, of)
        return res.reshape(out.shape)
    return _escape_add_diff(esc.nbr, esc.w, esc.rows, x, out)


def spmm_sliding_dense(graph, x: Array, f_blk: "int | None" = None) -> Array:
    """Sliding-ring streamed-S aggregation (v4): delta window DMA + one MXU
    matmul per destination block over the full folded feature width; HBM
    traffic ≈ S + x + out, each read/written once. Batched inputs fold into
    the feature axis and share a single S stream (up to the ring's VMEM
    budget, beyond which columns are chunked).

    ``f_blk`` (optional) is an upper bound on the column chunk width
    (rounded up to a lane multiple of 128); by default the chunk width is
    derived from the ring's VMEM budget — the fastest choice, since every
    extra column chunk re-streams S once.

    Escape-window graphs (``graph.escape`` set by
    ``to_sliding_dense(window_size=...)``) add the out-of-window edges back
    via the gather-only :class:`gwen_tpu.graph.graph.EscapeFixup` path
    (unique-receiver ELL + inverse-permutation placement — no segment_sum
    scatter anywhere, which measured ~8 ms for 79k escapes at L8).
    """
    return _sliding_escape_add(
        graph, x, _spmm_sliding_dense_core(graph, x, f_blk)
    )


def _spmm_sliding_dense_core(graph, x: Array, f_blk: "int | None" = None) -> Array:
    """The kernel path of :func:`spmm_sliding_dense` (in-window edges only)."""
    from gwen_tpu.graph.graph import SlidingDenseGraph

    assert isinstance(graph, SlidingDenseGraph)
    leading = x.shape[:-2]
    n, f = x.shape[-2], x.shape[-1]
    n_pad = graph.num_padded_nodes
    src_rows = graph.num_src_rows
    if n not in (graph.num_nodes, n_pad, src_rows):
        raise ValueError(
            f"x has {n} node rows; graph expects {graph.num_nodes} "
            f"({n_pad} padded dst, {src_rows} src)"
        )
    out_rows = n if src_rows == n_pad else n_pad
    src_alloc = _round_up(src_rows, graph.block_size)
    itemsize = jnp.dtype(x.dtype).itemsize
    f_pad = _round_up(f, 128)

    if leading:
        # Batched path: (B, N, F) stays in natural layout — the kernel DMAs
        # per (batch, chunk) and runs B matmuls per streamed S tile. No fold
        # transpose (a moveaxis+reshape costs several full passes over x,
        # more than the kernel itself at mesh scale).
        xb = x.reshape((-1,) + x.shape[-2:])
        nb = xb.shape[0]
        per_b = graph.ring_rows * f_pad * itemsize
        if per_b > _SLIDING_RING_VMEM_BYTES:
            # Very wide features: per-sample calls with column chunking.
            out = jnp.stack([_spmm_sliding_dense_core(graph, xb[b])
                             for b in range(nb)])
            return out.reshape(leading + out.shape[-2:])
        nb_chunk = max(_SLIDING_RING_VMEM_BYTES // per_b, 1)
        xp = jnp.zeros((nb, src_alloc, f_pad), x.dtype)
        xp = xp.at[:, :n, :f].set(xb)
        outs = []
        for b0 in range(0, nb, nb_chunk):
            outs.append(_sliding_diff_b(
                graph.window_start, graph.delta_blocks, graph.s_mat,
                xp[b0:b0 + nb_chunk],
                graph.block_size, graph.window_size, graph.ring_rows,
                graph.max_delta_blocks,
            ))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        out = out[:, :out_rows, :f]
        return out.reshape(leading + out.shape[-2:])

    # Unbatched path: column chunk width = whole feature width if the ring
    # fits the VMEM budget, else the largest 128-multiple that does.
    w_budget = _SLIDING_RING_VMEM_BYTES // (graph.ring_rows * itemsize)
    w_chunk = max((w_budget // 128) * 128, 128)
    if f_blk is not None:
        w_chunk = min(w_chunk, max(_round_up(f_blk, 128), 128))
    w_chunk = min(w_chunk, f_pad)
    # Pad source rows so every window/delta chunk stays in bounds.
    xp = jnp.zeros((src_alloc, f_pad), x.dtype)
    xp = xp.at[:n, :f].set(x)

    outs = []
    for c0 in range(0, f_pad, w_chunk):
        w = min(w_chunk, f_pad - c0)
        outs.append(_sliding_diff(
            graph.window_start, graph.delta_blocks, graph.s_mat,
            xp[:, c0:c0 + w],
            graph.block_size, graph.window_size, graph.ring_rows,
            graph.max_delta_blocks,
        ))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return out[:out_rows, :f]


# ------------------------------ diagonal-window superblock kernel (v6)


def _diag_kernel(window, buf, t_sb, num_super, cnt_pad, packed, scaled,
                 *refs):
    """Per grid step: one fresh double-buffered DMA of the superblock's
    union x-window, then ``t_sb`` MXU matmuls — each sub-block contracts its
    (block, window) window-relative S tile against a block-aligned dynamic
    slice of the buffer. Grid steps (and their ~0.5 µs Mosaic overhead) drop
    ``t_sb``-fold vs the sliding kernel; S carries zero ring-slack columns.

    With ``cnt_pad > 0`` the escape contributions arrive as a (U, F) fix
    array in HBM whose rows are sorted by destination: the superblock's
    blocks cover ONE contiguous union slice (``es_ref`` per-superblock
    start, ``cnt_pad`` rows), fetched with a single DMA double-buffered
    alongside x, and every sub-block places its rows with a one-hot MXU
    matmul over the whole slice (prefetched block-local row tables; rows
    outside the block hit the ``block`` sentinel → no-op columns). An XLA
    scatter placement measured ~70 ns/row (2.7 ms at L8); per-*block*
    padded slices (round 3/4) moved t_sb small DMAs of max-per-block
    padded rows per step (~4.1 of 15.5 ms at L9); the union slice streams
    the same rows once, overlapped with the S stream."""
    has_esc = cnt_pad > 0
    it = iter(refs)
    off_ref, xb_ref = next(it), next(it)
    es_ref = next(it) if has_esc else None
    s_ref = next(it)
    lrow_ref = next(it) if has_esc else None
    rs_ref = next(it) if scaled else None
    fix_hbm = next(it) if has_esc else None
    x_hbm = next(it)
    c_hbm = next(it) if scaled else None
    out_ref, xbuf = next(it), next(it)
    fbuf = next(it) if has_esc else None
    sems = next(it)
    fsems = next(it) if has_esc else None
    cbuf = next(it) if scaled else None
    csem = next(it) if scaled else None
    j = pl.program_id(0)
    block = (s_ref.shape[0] * 8 if packed else s_ref.shape[0]) // t_sb

    def dma(sb, slot):
        base = pl.multiple_of(xb_ref[sb], block)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, buf), :],
            xbuf.at[pl.ds(slot * buf, buf), :],
            sems.at[slot],
        )

    def cdma(sb, slot):
        # the column-scale array is sublane-replicated x16 so the per-slot
        # DMA destination is tile-aligned for both f32 (8) and bf16 (16)
        # tilings — Mosaic rejects dynamic 1-sublane memref slices.
        base = pl.multiple_of(xb_ref[sb], block)
        return pltpu.make_async_copy(
            c_hbm.at[:, pl.ds(base, buf)],
            cbuf.at[pl.ds(slot * 16, 16), :],
            csem.at[slot],
        )

    def fdma(sb, slot):
        return pltpu.make_async_copy(
            fix_hbm.at[pl.ds(pl.multiple_of(es_ref[sb], 8), cnt_pad), :],
            fbuf.at[pl.ds(slot * cnt_pad, cnt_pad), :],
            fsems.at[slot],
        )

    def start_all(sb, slot):
        dma(sb, slot).start()
        if scaled:
            cdma(sb, slot).start()
        if has_esc:
            fdma(sb, slot).start()

    @pl.when(j == 0)
    def _():
        start_all(0, 0)
        if num_super > 1:
            start_all(jnp.int32(1), 1)

    slot = jax.lax.rem(j, 2)
    dma(j, slot).wait()
    if scaled:
        cdma(j, slot).wait()
    if has_esc:
        fdma(j, slot).wait()

    prec = jax.lax.Precision.HIGHEST if xbuf.dtype == jnp.float32 else None
    gpb = block // 8
    for t in range(t_sb):
        off = pl.multiple_of(off_ref[j * t_sb + t], block)
        xw = xbuf[pl.ds(slot * buf + off, window), :]
        if packed:
            s_t = _unpack_s01(s_ref[t * gpb:(t + 1) * gpb, :], block,
                              window, xbuf.dtype)
            if scaled:
                # Rank-1 GCN weights rebuilt IN-KERNEL: S = a_r a_s ⊙ S01.
                # The (1, window) column-scale slice broadcasts over
                # sublanes relayout-free; the row scale applies after the
                # escape add (escape fix rows carry Σ a_s x_s — tables
                # built with w = a_s — so a_r distributes over both
                # terms). Doing this here instead of scaling x/out in XLA
                # saves ~4 full (N, F) HBM passes per call (~4.6 ms at
                # L9): elementwise ops can never fuse INTO a custom call.
                s_t = s_t * cbuf[pl.ds(slot * 16, 1),
                                 pl.ds(off, window)]
        else:
            s_t = s_ref[t * block:(t + 1) * block, :].astype(xbuf.dtype)
        acc = jnp.dot(
            s_t, xw,
            preferred_element_type=jnp.float32, precision=prec,
        )
        if has_esc:
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (block, cnt_pad), 0)
                == lrow_ref[t, :].reshape(1, cnt_pad)
            ).astype(xbuf.dtype)
            fchunk = fbuf[pl.ds(slot * cnt_pad, cnt_pad), :]
            acc = acc + jnp.dot(
                onehot, fchunk,
                preferred_element_type=jnp.float32, precision=prec,
            )
        if scaled:
            rowt = jax.lax.transpose(
                rs_ref[0:1, t * block:(t + 1) * block], (1, 0))
            acc = acc * rowt.astype(jnp.float32)
        out_ref[t * block:(t + 1) * block, :] = acc.astype(out_ref.dtype)

    @pl.when(j + 2 < num_super)
    def _():
        start_all(jnp.minimum(j + 2, num_super - 1), slot)


def _pad_lrow(lrow, num_super, t_sb, cnt_pad):
    """Round the per-superblock lrow row count up to 8.

    The escape placement table streams as a ``(t_sb, cnt_pad)`` VMEM block
    per grid step, but Mosaic requires the sublane block dim to be
    8-divisible (or the full array) — ``t_sb < 8`` (small/partitioned
    graphs; caught by a real-TPU dryrun, NOT by interpret mode) is
    otherwise rejected at lowering. Pad rows carry the ``block`` sentinel
    value's no-op semantics but are simply never read (the kernel unrolls
    ``t < t_sb``). No-op for the production ``t_sb % 8 == 0`` configs.

    Returns ``(lrow', rows_per_super)``.
    """
    if t_sb % 8 == 0:
        return lrow, t_sb
    lpr = _round_up(t_sb, 8)
    l3 = lrow.reshape(num_super, t_sb, cnt_pad)
    l3 = jnp.pad(l3, ((0, 0), (0, lpr - t_sb), (0, 0)))
    return l3.reshape(num_super * lpr, cnt_pad), lpr


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _diag_impl(off, xbase, estart, s_mat, lrow, fix, x_pad,
               block, window, t_sb, cnt_pad, packed=False,
               rrow=None, rcol=None):
    n_pad = s_mat.shape[0] * 8 if packed else s_mat.shape[0]
    f_pad = x_pad.shape[1]
    num_super = n_pad // (block * t_sb)
    buf = window + (t_sb - 1) * block
    has_esc = cnt_pad > 0
    scaled = packed and rrow is not None
    s_rows = (block * t_sb // 8) if packed else (block * t_sb)

    idx = lambda j, *_: (j, 0)  # noqa: E731 — shared block index map
    in_specs = [
        pl.BlockSpec((s_rows, window), idx, memory_space=pltpu.VMEM),
    ]
    args = [off, xbase]
    scratch = [
        pltpu.VMEM((2 * buf, f_pad), x_pad.dtype),
    ]
    mid_args = [s_mat]
    if has_esc:
        args.append(estart)
        lrow, lpr = _pad_lrow(lrow, num_super, t_sb, cnt_pad)
        in_specs.append(
            pl.BlockSpec((lpr, cnt_pad), idx, memory_space=pltpu.VMEM)
        )
        mid_args.append(lrow)
    if scaled:
        # (1, n_pad) row scales as a streamed VMEM block; (1, src) column
        # scales DMA'd per superblock window alongside x (5 KB/step).
        in_specs.append(
            pl.BlockSpec((1, block * t_sb), lambda j, *_: (0, j),
                         memory_space=pltpu.VMEM)
        )
        mid_args.append(rrow)
    if has_esc:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2 * cnt_pad, f_pad), x_pad.dtype))
        mid_args.append(fix)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    mid_args.append(x_pad)
    if scaled:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        mid_args.append(rcol)
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if has_esc:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if scaled:
        scratch.append(pltpu.VMEM((2 * 16, buf), x_pad.dtype))
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    call_args = args + mid_args

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if has_esc else 2,
        grid=(num_super,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block * t_sb, f_pad), idx,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_diag_kernel, window, buf, t_sb, num_super,
                               cnt_pad if has_esc else 0, packed, scaled)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), x_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * (window + (cnt_pad if has_esc else 0)) * f_pad,
            bytes_accessed=s_mat.size * s_mat.dtype.itemsize
            + 2 * x_pad.size * x_pad.dtype.itemsize
            + (fix.size * fix.dtype.itemsize if has_esc else 0),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*call_args)


def _diag_kernel_b(window, buf, t_sb, num_super, nb, cnt_pad, packed,
                   scaled, *refs):
    """Batched diag kernel: 2-D grid ``(num_super, nb)`` with the batch axis
    innermost, so each streamed (block·t_sb, window) S tile is fetched ONCE
    per superblock and reused across all ``nb`` batch entries (S traffic
    ÷ nb vs per-sample dispatches — the S stream is the measured wall at
    F=256). x/fix stay in natural (B, rows, F) layout; each grid step DMAs
    one (j, b) union window, double-buffered over the flattened step index.
    ``scaled``: in-kernel rank-1 weights, see :func:`_diag_kernel`."""
    has_esc = cnt_pad > 0
    it = iter(refs)
    off_ref, xb_ref = next(it), next(it)
    es_ref = next(it) if has_esc else None
    s_ref = next(it)
    lrow_ref = next(it) if has_esc else None
    rs_ref = next(it) if scaled else None
    fix_hbm = next(it) if has_esc else None
    x_hbm = next(it)
    c_hbm = next(it) if scaled else None
    out_ref, xbuf = next(it), next(it)
    fbuf = next(it) if has_esc else None
    sems = next(it)
    fsems = next(it) if has_esc else None
    cbuf = next(it) if scaled else None
    csem = next(it) if scaled else None
    j = pl.program_id(0)
    b = pl.program_id(1)
    step = j * nb + b
    total = num_super * nb
    block = (s_ref.shape[0] * 8 if packed else s_ref.shape[0]) // t_sb

    def dma(s_idx, slot):
        jj = s_idx // nb
        bb = jax.lax.rem(s_idx, nb)
        base = pl.multiple_of(xb_ref[jj], block)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(base, buf), :],
            xbuf.at[pl.ds(slot * buf, buf), :],
            sems.at[slot],
        )

    def cdma(s_idx, slot):
        # see the unbatched cdma: x16-replicated scales, tile-aligned slots
        jj = s_idx // nb
        base = pl.multiple_of(xb_ref[jj], block)
        return pltpu.make_async_copy(
            c_hbm.at[:, pl.ds(base, buf)],
            cbuf.at[pl.ds(slot * 16, 16), :],
            csem.at[slot],
        )

    def fdma(s_idx, slot):
        jj = s_idx // nb
        bb = jax.lax.rem(s_idx, nb)
        return pltpu.make_async_copy(
            fix_hbm.at[bb, pl.ds(pl.multiple_of(es_ref[jj], 8),
                                 cnt_pad), :],
            fbuf.at[pl.ds(slot * cnt_pad, cnt_pad), :],
            fsems.at[slot],
        )

    def start_all(s_idx, slot):
        dma(s_idx, slot).start()
        if scaled:
            cdma(s_idx, slot).start()
        if has_esc:
            fdma(s_idx, slot).start()

    @pl.when(step == 0)
    def _():
        start_all(0, 0)
        if total > 1:
            start_all(jnp.int32(1), 1)

    slot = jax.lax.rem(step, 2)
    dma(step, slot).wait()
    if scaled:
        cdma(step, slot).wait()
    if has_esc:
        fdma(step, slot).wait()

    prec = jax.lax.Precision.HIGHEST if xbuf.dtype == jnp.float32 else None
    gpb = block // 8
    for t in range(t_sb):
        off = pl.multiple_of(off_ref[j * t_sb + t], block)
        xw = xbuf[pl.ds(slot * buf + off, window), :]
        if packed:
            s_t = _unpack_s01(s_ref[t * gpb:(t + 1) * gpb, :], block,
                              window, xbuf.dtype)
            if scaled:
                s_t = s_t * cbuf[pl.ds(slot * 16, 1),
                                 pl.ds(off, window)]
        else:
            s_t = s_ref[t * block:(t + 1) * block, :].astype(xbuf.dtype)
        acc = jnp.dot(
            s_t, xw,
            preferred_element_type=jnp.float32, precision=prec,
        )
        if has_esc:
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (block, cnt_pad), 0)
                == lrow_ref[t, :].reshape(1, cnt_pad)
            ).astype(xbuf.dtype)
            fchunk = fbuf[pl.ds(slot * cnt_pad, cnt_pad), :]
            acc = acc + jnp.dot(
                onehot, fchunk,
                preferred_element_type=jnp.float32, precision=prec,
            )
        if scaled:
            rowt = jax.lax.transpose(
                rs_ref[0:1, t * block:(t + 1) * block], (1, 0))
            acc = acc * rowt.astype(jnp.float32)
        out_ref[0, t * block:(t + 1) * block, :] = acc.astype(out_ref.dtype)

    @pl.when(step + 2 < total)
    def _():
        start_all(jnp.minimum(step + 2, total - 1), slot)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _diag_impl_b(off, xbase, estart, s_mat, lrow, fix, x_pad,
                 block, window, t_sb, cnt_pad, packed=False,
                 rrow=None, rcol=None):
    """Batched ``_diag_impl``: ``x_pad`` is (B, src, F); out (B, n_pad, F).
    Per-step VMEM is identical to the unbatched kernel (one (j, b) window
    at a time) — only the grid grows."""
    n_pad = s_mat.shape[0] * 8 if packed else s_mat.shape[0]
    nb, _, f_pad = x_pad.shape
    num_super = n_pad // (block * t_sb)
    buf = window + (t_sb - 1) * block
    has_esc = cnt_pad > 0
    scaled = packed and rrow is not None
    s_rows = (block * t_sb // 8) if packed else (block * t_sb)

    s_idx = lambda j, b, *_: (j, 0)  # noqa: E731 — S reused across batch
    o_idx = lambda j, b, *_: (b, j, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((s_rows, window), s_idx, memory_space=pltpu.VMEM),
    ]
    args = [off, xbase]
    scratch = [
        pltpu.VMEM((2 * buf, f_pad), x_pad.dtype),
    ]
    mid_args = [s_mat]
    if has_esc:
        args.append(estart)
        lrow, lpr = _pad_lrow(lrow, num_super, t_sb, cnt_pad)
        in_specs.append(
            pl.BlockSpec((lpr, cnt_pad), s_idx, memory_space=pltpu.VMEM)
        )
        mid_args.append(lrow)
    if scaled:
        in_specs.append(
            pl.BlockSpec((1, block * t_sb), lambda j, b, *_: (0, j),
                         memory_space=pltpu.VMEM)
        )
        mid_args.append(rrow)
    if has_esc:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2 * cnt_pad, f_pad), x_pad.dtype))
        mid_args.append(fix)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    mid_args.append(x_pad)
    if scaled:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        mid_args.append(rcol)
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if has_esc:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if scaled:
        scratch.append(pltpu.VMEM((2 * 16, buf), x_pad.dtype))
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    call_args = args + mid_args

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if has_esc else 2,
        grid=(num_super, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block * t_sb, f_pad), o_idx,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_diag_kernel_b, window, buf, t_sb, num_super,
                               nb, cnt_pad if has_esc else 0, packed,
                               scaled)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, n_pad, f_pad), x_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * n_pad * (window + (cnt_pad if has_esc else 0))
            * f_pad,
            bytes_accessed=s_mat.size * s_mat.dtype.itemsize
            + 2 * x_pad.size * x_pad.dtype.itemsize
            + (fix.size * fix.dtype.itemsize if has_esc else 0),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*call_args)


def _diag_comp_impl(off, xbase, s_mat, nbr, w, estart, lrow, e2, xp,
                    block, window, t_sb, w_chunk, cnt_pad, e2_static,
                    packed=False, rrow=None, rcol=None):
    """Full composite: escape contributions gathered into the (U, F) fix
    array, then placed inside the kernel via contiguous DMA + one-hot
    matmul. ``nbr is None`` means no escapes. With ``e2`` (large escape
    sets) the fix comes from the hierarchical contraction: one fused
    compaction+RCM gather, a banded sliding-kernel contraction in compact
    space, and one gather back to placement (receiver-sorted) order —
    replacing the per-edge ELL gather whose random 512 B row reads cost
    ~12 ns each.

    ``rrow``/``rcol`` ((1, n_pad) / (1, src)): packed graphs' rank-1 GCN
    weights, rebuilt IN-KERNEL (S = a_r a_s ⊙ S01). The escape tables of
    such graphs are built with w = a_s, so the fix rows arrive as
    Σ a_s x_s and only the in-kernel a_r row scale remains — x and out
    are never scaled by XLA elementwise passes (which cannot fuse into a
    custom call and cost ~4 full (N, F) HBM sweeps per call at L9)."""
    f_pad = xp.shape[-1]
    batched = xp.ndim == 3
    impl = _diag_impl_b if batched else _diag_impl
    fix = None
    if e2 is not None:
        from gwen_tpu.graph.graph import SlidingDenseGraph

        e2_src, e2_back, e2_smat, e2_ws, e2_db = e2
        b2, w2, md2, sr2, n2, ne2 = e2_static
        g2 = SlidingDenseGraph(
            s_mat=e2_smat, window_start=e2_ws, delta_blocks=e2_db,
            num_nodes=n2, num_edges=ne2, block_size=b2, window_size=w2,
            max_delta_blocks=md2, num_src_rows=sr2,
        )
        xc2 = jnp.take(xp, e2_src, axis=-2)
        fixc2 = _spmm_sliding_dense_core(g2, xc2)
        fix = jnp.take(fixc2, e2_back, axis=-2).astype(xp.dtype)
    elif nbr is not None:
        fix = _escape_rows_fix(nbr, w, xp).astype(xp.dtype)
    outs = []
    for c0 in range(0, f_pad, w_chunk):
        wc = min(w_chunk, f_pad - c0)
        outs.append(impl(
            off, xbase, estart, s_mat, lrow,
            None if fix is None else fix[..., c0:c0 + wc],
            xp[..., c0:c0 + wc],
            block, window, t_sb, cnt_pad if fix is not None else 0,
            packed, rrow, rcol,
        ))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(9, 10, 11, 12, 13, 14, 15))
def _diag_comp_diff(off, xbase, s_mat, nbr, w, estart, lrow, e2, xp,
                    block, window, t_sb, w_chunk, cnt_pad, e2_static,
                    packed=False, rrow=None, rcol=None):
    return _diag_comp_impl(off, xbase, s_mat, nbr, w, estart, lrow, e2, xp,
                           block, window, t_sb, w_chunk, cnt_pad, e2_static,
                           packed, rrow, rcol)


def _diag_comp_fwd(off, xbase, s_mat, nbr, w, estart, lrow, e2, xp,
                   block, window, t_sb, w_chunk, cnt_pad, e2_static,
                   packed=False, rrow=None, rcol=None):
    out = _diag_comp_impl(off, xbase, s_mat, nbr, w, estart, lrow, e2, xp,
                          block, window, t_sb, w_chunk, cnt_pad, e2_static,
                          packed, rrow, rcol)
    return out, (off, xbase, s_mat, nbr, w, estart, lrow, e2, xp.shape[-2],
                 rrow, rcol)


def _diag_comp_bwd(block, window, t_sb, w_chunk, cnt_pad, e2_static, packed,
                   res, g):
    # The composite operator (in-window S + symmetrized escapes) is globally
    # symmetric and zero on padding rows/cols, so the x-cotangent is the
    # same composite applied to the cotangent's source-row slice. (The
    # packed composite carries the rank-1 scales in-kernel — S = a_r a_s
    # ⊙ S01 is itself symmetric, so bwd = fwd with the SAME scales.)
    (off, xbase, s_mat, nbr, w, estart, lrow, e2, src_rows,
     rrow, rcol) = res
    gx = _diag_comp_impl(off, xbase, s_mat, nbr, w, estart, lrow, e2,
                         g[..., :src_rows, :], block, window, t_sb, w_chunk,
                         cnt_pad, e2_static, packed, rrow, rcol)
    return (None, None, None, None, None, None, None,
            None if e2 is None else (None,) * len(e2),
            gx[..., :src_rows, :].astype(g.dtype),
            None, None)


_diag_comp_diff.defvjp(_diag_comp_fwd, _diag_comp_bwd)


def spmm_diag_window(graph, x: Array, f_blk: "int | None" = None) -> Array:
    """Diagonal-window superblock aggregation (v6; see
    ``gwen_tpu.graph.graph.DiagWindowGraph``). Escape-window graphs add the
    out-of-window edges back inside the kernel: the (U, F) escape fix is
    gathered outside (~free), each destination block DMAs its contiguous
    fix slice, and a one-hot MXU matmul places it — no XLA scatter (which
    measured ~70 ns/row) anywhere in the composite."""
    return _spmm_diag_window_core(graph, x, f_blk)


def _spmm_diag_window_core(graph, x: Array, f_blk: "int | None" = None) -> Array:
    from gwen_tpu.graph.graph import DiagWindowGraph

    assert isinstance(graph, DiagWindowGraph)
    leading = x.shape[:-2]
    n, f = x.shape[-2], x.shape[-1]
    n_pad = graph.num_padded_nodes
    src_alloc = graph.num_src_rows
    if n not in (graph.num_nodes, n_pad, src_alloc):
        raise ValueError(
            f"x has {n} node rows; graph expects {graph.num_nodes} "
            f"({n_pad} padded dst, {src_alloc} src)"
        )
    f_pad = _round_up(f, 128)
    itemsize = jnp.dtype(x.dtype).itemsize

    # Column chunk: double x buffers + the double-buffered escape-fix
    # slices must fit the VMEM budget (per-step cost is identical for the
    # batched kernel — one (j, b) window buffers at a time).
    esc = graph.escape
    row_cost = 2 * graph.buf_rows + (
        2 * graph.esc_cnt_pad if esc is not None else 0
    )
    w_budget = _SLIDING_RING_VMEM_BYTES // (row_cost * itemsize)
    w_chunk = max((w_budget // 128) * 128, 128)
    if f_blk is not None:
        w_chunk = min(w_chunk, max(_round_up(f_blk, 128), 128))
    w_chunk = min(w_chunk, f_pad)

    # Pre-padded fast path: when callers keep node tensors at src_alloc
    # rows (EncodeProcessDecode pads once around its process loop), the
    # zeros+set materialization below is skipped entirely. That copy is a
    # full extra HBM pass over x per call — at L9 it was ~4 ms of the
    # 18.6 ms composite, bigger than the in-kernel escape placement.
    prepadded = f == f_pad and n in (src_alloc, n_pad)
    if leading:
        # Batched path: one kernel call over a (B, src, F) natural layout —
        # the 2-D grid streams each S tile once and reuses it across the
        # batch (per-sample dispatches re-stream S B times).
        xb = x.reshape((-1,) + x.shape[-2:])
        if prepadded:
            xp = xb
        else:
            nb = xb.shape[0]
            xp = jnp.zeros((nb, src_alloc, f_pad), x.dtype)
            rows = min(n, src_alloc)
            xp = xp.at[:, :rows, :f].set(xb[:, :rows])
    else:
        if prepadded:
            xp = x
        else:
            xp = jnp.zeros((src_alloc, f_pad), x.dtype)
            xp = xp.at[: min(n, src_alloc), :f].set(x[: min(n, src_alloc)])

    e2 = e2_static = None
    g2 = graph.esc2_graph
    if g2 is not None:
        e2 = (graph.esc2_src, graph.esc2_back, g2.s_mat, g2.window_start,
              g2.delta_blocks)
        e2_static = (g2.block_size, g2.window_size, g2.max_delta_blocks,
                     g2.num_src_rows, g2.num_nodes, g2.num_edges)
    packed = graph.s_pack is not None
    rrow = rcol = None
    if packed:
        # Rank-1 GCN weights rebuilt IN-KERNEL (S = a_r a_s ⊙ S01): the
        # scales travel as (1, N) lane vectors — the row block streamed
        # per superblock, the column window DMA'd alongside x — instead of
        # XLA-materialized a⊙x / a⊙out passes (which cannot fuse into a
        # custom call; ~4.6 ms of pure HBM traffic per call at L9).
        # Escape tables on packed graphs carry w = a_s (graph.py), so the
        # fix rows compose with the in-kernel a_r row scale exactly.
        rrow = graph.r1_row[None, :].astype(xp.dtype)
        # x16 sublane replication: the kernel's per-slot column-scale DMA
        # destination must be tile-aligned (16 covers bf16's (16, 128)
        # tiling; 8-row f32 tiles divide it). ~80 MB at L9 — 3% of x.
        rcol = jnp.broadcast_to(
            graph.r1_col[None, : xp.shape[-2]].astype(xp.dtype),
            (16, xp.shape[-2]))
    out = _diag_comp_diff(
        graph.offsets, graph.xbase,
        graph.s_pack if packed else graph.s_mat,
        None if esc is None else esc.nbr,
        None if esc is None else esc.w,
        graph.esc_start, graph.esc_lrow, e2, xp,
        graph.block_size, graph.window_size, graph.superblock, w_chunk,
        graph.esc_cnt_pad, e2_static, packed, rrow, rcol,
    )
    out = out[..., : (n if prepadded else graph.num_nodes), :f]
    if leading:
        out = out.reshape(leading + out.shape[-2:])
    return out


# --------------------------------- bit-packed rank-1 sliding kernel (v5)


def _unpack_s01(packed, block, ring_rows, out_dtype):
    """(block//8, ring) uint8 → (block, ring) 0/1 in ``out_dtype``.

    The packing is TILE-ordered to match ``pltpu.repeat`` semantics (which
    concatenates whole-array copies, measured on hardware — NOT an
    elementwise repeat): block-local output row ``l`` is bit ``l // gpb`` of
    packed row ``l % gpb`` where ``gpb = block // 8``. Tile-replicate ×8,
    AND with the per-row bit mask, compare — ~3 VPU passes, no strided
    access.
    """
    gpb = block // 8
    if _interpret():
        rep = jnp.tile(packed, (8, 1))
    else:
        rep = pltpu.repeat(packed, 8, axis=0)
    mask = (1 << (jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0) // gpb))
    bit = (rep & mask.astype(packed.dtype)) != 0
    return bit.astype(out_dtype)


def _sliding_packed_kernel(window, ring_rows, max_fill, num_blocks,
                           ws_ref, db_ref, sp_ref, x_hbm, out_ref, ring, sems):
    i = pl.program_id(0)
    block = out_ref.shape[0]

    def chunk(step, k):
        base = jnp.where(step == 0, ws_ref[0],
                         ws_ref[jnp.maximum(step - 1, 0)] + window)
        src = pl.multiple_of(base + k * block, block)
        dst = pl.multiple_of(jax.lax.rem(src, ring_rows), block)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, block), :],
            ring.at[pl.ds(dst, block), :],
            sems.at[k],
        )

    max_delta = max_fill[1]
    max_fill = max_fill[0]

    @pl.when(i == 0)
    def _():
        ring[:] = jnp.zeros_like(ring)
        for k in range(max_fill):
            @pl.when(k < db_ref[0])
            def _(k=k):
                chunk(0, k).start()
        for k in range(max_fill):
            @pl.when(k < db_ref[0])
            def _(k=k):
                chunk(0, k).wait()

    @pl.when(i > 0)
    def _():
        for k in range(max_delta):
            @pl.when(k < db_ref[i])
            def _(k=k):
                chunk(i, k).wait()

    for k in range(max_delta):
        @pl.when((i + 1 < num_blocks) & (k < db_ref[jnp.minimum(i + 1, num_blocks - 1)]))
        def _(k=k):
            chunk(i + 1, k).start()

    s01 = _unpack_s01(sp_ref[:], block, ring_rows, ring.dtype)
    prec = jax.lax.Precision.HIGHEST if ring.dtype == jnp.float32 else None
    out_ref[:] = jnp.dot(
        s01, ring[:],
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _sliding_packed_impl(ws, db, packed, x_pad, block, window, ring_rows,
                         max_delta):
    n_pad_dst = packed.shape[0] * 8
    f_pad = x_pad.shape[1]
    num_blocks = n_pad_dst // block
    max_fill = (max(window // block, 1), max(max_delta, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((block // 8, ring_rows), lambda i, ws_, db_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, f_pad), lambda i, ws_, db_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ring_rows, f_pad), x_pad.dtype),
            pltpu.SemaphoreType.DMA((max_fill[0],)),
        ],
    )
    kernel = functools.partial(
        _sliding_packed_kernel, window, ring_rows, max_fill, num_blocks
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad_dst, f_pad), x_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad_dst * ring_rows * f_pad,
            bytes_accessed=packed.size
            + x_pad.size * x_pad.dtype.itemsize
            + n_pad_dst * f_pad * x_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(ws, db, packed, x_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _sliding_packed_diff(ws, db, packed, xp, block, window, ring_rows,
                         max_delta):
    return _sliding_packed_impl(ws, db, packed, xp, block, window, ring_rows,
                                max_delta)


def _sliding_packed_fwd(ws, db, packed, xp, block, window, ring_rows,
                        max_delta):
    return (
        _sliding_packed_impl(ws, db, packed, xp, block, window, ring_rows,
                             max_delta),
        (ws, db, packed),
    )


def _sliding_packed_bwd(block, window, ring_rows, max_delta, res, g):
    ws, db, packed = res
    # S01 is the global binary adjacency (+ self loops) of an undirected
    # graph: square and symmetric, so backward reuses the forward kernel.
    gx = _sliding_packed_impl(ws, db, packed, g, block, window, ring_rows,
                              max_delta)
    return (None, None, None, gx.astype(g.dtype))


_sliding_packed_diff.defvjp(_sliding_packed_fwd, _sliding_packed_bwd)


def spmm_sliding_packed(graph, x: Array, f_blk: "int | None" = None) -> Array:
    """Bit-packed rank-1 sliding aggregation (v5): the kernel streams the
    row-packed binary S01 (8 rows/byte — 1/16 the HBM bytes of bf16 weighted
    S), unpacks a (block, ring) tile in ~3 VPU passes, and runs the same
    ring-buffered matmul as v4. Exact GCN scales apply outside. This is what
    fits L9 (2.6M nodes) onto the MXU sliding path.

    Leading batch dims fold into the feature axis (aggregation is node-wise
    linear); ``f_blk`` optionally caps the column chunk width.
    """
    from gwen_tpu.graph.graph import SlidingPackedGraph

    assert isinstance(graph, SlidingPackedGraph)
    leading = x.shape[:-2]
    n, f = x.shape[-2], x.shape[-1]
    n_pad = graph.num_padded_nodes
    src_rows = graph.num_src_rows
    if n not in (graph.num_nodes, n_pad, src_rows):
        raise ValueError(
            f"x has {n} node rows; graph expects {graph.num_nodes} "
            f"({n_pad} padded dst, {src_rows} src)"
        )
    out_rows = n if src_rows == n_pad else n_pad
    xs = x * graph.col_scale[:n, None].astype(x.dtype)

    if leading:
        xm = jnp.moveaxis(xs.reshape((-1,) + x.shape[-2:]), 0, -1)
        xm = xm.reshape(n, -1)
    else:
        xm = xs
    fold = xm.shape[1]
    f_pad = _round_up(fold, 128)
    src_alloc = _round_up(src_rows, graph.block_size)
    itemsize = jnp.dtype(x.dtype).itemsize
    w_budget = _SLIDING_RING_VMEM_BYTES // (graph.ring_rows * itemsize)
    w_chunk = max((w_budget // 128) * 128, 128)
    if f_blk is not None:
        w_chunk = min(w_chunk, max(_round_up(f_blk, 128), 128))
    w_chunk = min(w_chunk, f_pad)
    xp = jnp.zeros((src_alloc, f_pad), xm.dtype)
    xp = xp.at[: xm.shape[0], :fold].set(xm)

    outs = []
    for c0 in range(0, f_pad, w_chunk):
        w = min(w_chunk, f_pad - c0)
        outs.append(_sliding_packed_diff(
            graph.window_start, graph.delta_blocks, graph.packed,
            xp[:, c0:c0 + w],
            graph.block_size, graph.window_size, graph.ring_rows,
            graph.max_delta_blocks,
        ))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    out = out[:out_rows, :fold]
    if leading:
        out = out.reshape(out_rows, f, -1)
        out = jnp.moveaxis(out, -1, 0).reshape(leading + (out_rows, f))
    return out * graph.row_scale[:out_rows, None].astype(out.dtype)


def spmm_sliding_rank1(graph, x: Array, f_blk: "int | None" = None) -> Array:
    """int8 rank-1-factored sliding aggregation (v4.2): the kernel streams a
    *binary* int8 S01 (converted to the compute dtype in-VMEM — the stream is
    bandwidth-bound, so halving S bytes wins) and the exact GCN scales are
    applied elementwise outside: ``out = a ⊙ K(a ⊙ x)``.

    Differentiation composes automatically: K's custom VJP (K itself — S01 is
    globally symmetric) plus the elementwise scales give the exact cotangent
    ``a ⊙ K(a ⊙ g)``.
    """
    from gwen_tpu.graph.graph import SlidingRank1Graph

    assert isinstance(graph, SlidingRank1Graph)
    n = x.shape[-2]
    xs = x * graph.col_scale[:n, None].astype(x.dtype)
    out = spmm_sliding_dense(graph.core, xs, f_blk=f_blk)
    return out * graph.row_scale[: out.shape[-2], None].astype(out.dtype)
