"""Pallas TPU SDDMM / transpose-SpMM / windowed graph attention.

Completes the kernel family promised by the build plan (SURVEY §7.1 "Pallas
SpMM/SDDMM kernels") and adds the attention model family the reference lacks
(GCNConv only, models_gnn.py:118-184). All three operators ride the
diagonal-window superblock layout (:class:`gwen_tpu.graph.graph.
DiagWindowGraph` — KD-patch ordering, window-relative storage):

* :func:`diag_sddmm` — sampled dense-dense matmul: per destination block,
  ``scores = Q_block @ K_window^T`` → the ``(N_pad, W)`` window-relative
  score tile. Same double-buffered union-window DMA as the v6 SpMM kernel;
  one MXU matmul per sub-block with the RHS contracted on the feature axis.
* :func:`diag_spmm_t` — transpose aggregation ``out[j] = Σ_i S[i, j−w_i]
  g[i]``. Window starts are block-aligned and the window is a block
  multiple, so the transpose decomposes into full ``(block, block)`` tiles;
  host-built coverage tables (:func:`gwen_tpu.graph.graph.
  diag_transpose_tables`) list the covering tiles per *source* block and the
  kernel accumulates ``S_tile^T @ g_tile`` over them (double-buffered tile
  DMA). This is the missing VJP operand for *asymmetric* S — the GCN kernels
  exploit global symmetry (bwd = fwd), attention weights are row-softmaxed
  and never symmetric.
* :func:`diag_matvec` — ``S @ X`` with a *differentiable, runtime* S
  (the GCN path treats S as a constant graph table): forward reuses the v6
  kernel, ``dS = diag_sddmm(g, X)``, ``dX = diag_spmm_t(S, g)``. Also the
  building block for learned edge weights.
* :func:`windowed_attention` — masked softmax attention over each node's
  in-window neighbourhood: SDDMM → masked softmax on the ``(N_pad, W)``
  score tile (plain XLA: the tile is dense, no segment ops) → ``P @ V``
  via :func:`diag_matvec`. Out-of-window (escape) edges are *excluded by
  definition* — this is windowed attention in the sliding-window-attention
  sense (~98 % of mesh edges at the default window; the model, not an
  approximation of another model).

Numerics: scores and softmax are computed in f32 regardless of input dtype
(bf16 inputs take bf16 MXU passes with f32 accumulation); ``P`` is cast back
to the value dtype for the aggregation streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gwen_tpu.graph.graph import DiagWindowGraph
from gwen_tpu.ops.spmm_pallas import (_diag_impl, _interpret, _round_up,
                                      _unpack_s01)

Array = jnp.ndarray

_F_CHUNK = 512  # feature-axis chunk cap (VMEM budget, matches spmm kernels)

# Double-buffered scratch scales with the graph-dependent t_max (covering
# sub-blocks per source block): a wide-coverage graph can request more VMEM
# than the ~16 MB/core that exists, which surfaces as an opaque Mosaic
# compile failure. Check up front and fail with the actual numbers instead
# (round-4 advisor finding).
_VMEM_BUDGET = 12 * 2**20  # scratch allowance; headroom left for in/out tiles


def _check_vmem(kernel_name: str, nbytes: int) -> None:
    if nbytes > _VMEM_BUDGET:
        raise ValueError(
            f"{kernel_name}: requested {nbytes / 2**20:.1f} MiB of VMEM "
            f"scratch (> {_VMEM_BUDGET / 2**20:.0f} MiB budget) — the "
            "graph's coverage range (t_max) times the block/feature tile "
            "is too large. Reduce diag_window, superblock, or the feature "
            "chunk for this graph."
        )


# --------------------------------------------------------------- SDDMM


def _sddmm_kernel(window, buf, t_sb, num_super,
                  off_ref, xb_ref, a_ref, k_hbm, out_ref, xbuf, sems):
    """One grid step = one superblock: double-buffered DMA of the union
    K-window, then ``t_sb`` MXU matmuls ``A_block @ K_win^T`` (contraction
    on the feature axis)."""
    j = pl.program_id(0)
    block = a_ref.shape[0] // t_sb

    def dma(sb, slot):
        base = pl.multiple_of(xb_ref[sb], block)
        return pltpu.make_async_copy(
            k_hbm.at[pl.ds(base, buf), :],
            xbuf.at[pl.ds(slot * buf, buf), :],
            sems.at[slot],
        )

    @pl.when(j == 0)
    def _():
        dma(0, 0).start()
        if num_super > 1:
            dma(jnp.int32(1), 1).start()

    slot = jax.lax.rem(j, 2)
    dma(j, slot).wait()

    prec = jax.lax.Precision.HIGHEST if xbuf.dtype == jnp.float32 else None
    for t in range(t_sb):
        off = pl.multiple_of(off_ref[j * t_sb + t], block)
        xw = xbuf[pl.ds(slot * buf + off, window), :]
        a_t = a_ref[t * block:(t + 1) * block, :]
        out_ref[t * block:(t + 1) * block, :] = jax.lax.dot_general(
            a_t, xw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(out_ref.dtype)

    @pl.when(j + 2 < num_super)
    def _():
        dma(jnp.minimum(j + 2, num_super - 1), slot).start()


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _sddmm_impl(off, xbase, a_pad, k_pad, block, window, t_sb):
    n_pad = a_pad.shape[0]
    f_pad = a_pad.shape[1]
    num_super = n_pad // (block * t_sb)
    buf = window + (t_sb - 1) * block

    idx = lambda j, *_: (j, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_super,),
        in_specs=[
            pl.BlockSpec((block * t_sb, f_pad), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block * t_sb, window), idx,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * buf, f_pad), k_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_sddmm_kernel, window, buf, t_sb, num_super)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, window), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * window * f_pad,
            bytes_accessed=2 * k_pad.size * k_pad.dtype.itemsize
            + a_pad.size * a_pad.dtype.itemsize
            + n_pad * window * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(off, xbase, a_pad, k_pad)


def _sddmm_chunked(off, xbase, a_pad, k_pad, block, window, t_sb):
    """Accumulate SDDMM over feature-axis chunks (contraction axis)."""
    f_pad = a_pad.shape[1]
    out = None
    for c0 in range(0, f_pad, _F_CHUNK):
        wc = min(_F_CHUNK, f_pad - c0)
        part = _sddmm_impl(off, xbase, a_pad[:, c0:c0 + wc],
                           k_pad[:, c0:c0 + wc], block, window, t_sb)
        out = part if out is None else out + part
    return out


# ----------------------------------------------------- transpose SpMM


def _spmm_t_kernel(m_max, t_sb,
                   tlo_ref, tcnt_ref, off_ref, xb_ref, s_hbm, g_hbm,
                   out_ref, sbuf, gbuf, acc, sems):
    """One grid step = one *source* block: accumulate ``S_tile^T @ g_tile``
    over the covering destination sub-blocks (a contiguous range — window
    starts are monotonic). Tile coordinates are recomputed from the
    prefetched offsets/xbase: row = j·block, column = c·block − start_j —
    keeping SMEM at O(num_src_blocks) (a 2-D per-(c, m) table pads each
    row to 512 B and exceeds SMEM at L7+).

    DMA schedule: the whole NEXT grid step's tile set (every covering m,
    both operands, concurrent) is started while the current step
    computes, buffers alternating on the step parity — starting a step's
    first tiles at its own beginning stalls every step on a full DMA
    latency (~2 µs on 32 KB tiles; measured on the dK/dV kernel, which
    shares this structure)."""
    c = pl.program_id(0)
    ns = pl.num_programs(0)
    block = out_ref.shape[0]

    def _rc(cc, m):
        j = tlo_ref[cc] + m
        start = xb_ref[j // t_sb] + off_ref[j]
        r0 = pl.multiple_of(j * block, block)
        c0 = pl.multiple_of(cc * block - start, block)
        return r0, c0

    def tile_dmas(cc, m, slot):
        r0, c0 = _rc(cc, m)
        o = (slot * m_max + m) * block
        return (
            pltpu.make_async_copy(
                s_hbm.at[pl.ds(r0, block), pl.ds(c0, block)],
                sbuf.at[pl.ds(o, block), :], sems.at[slot, m, 0]),
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(r0, block), :],
                gbuf.at[pl.ds(o, block), :], sems.at[slot, m, 1]),
        )

    def start_step(cc, slot):
        for m in range(m_max):
            @pl.when(m < tcnt_ref[cc])
            def _(m=m):
                for d in tile_dmas(cc, m, slot):
                    d.start()

    slot = jax.lax.rem(c, 2)

    @pl.when(c == 0)
    def _():
        start_step(0, 0)

    @pl.when(c + 1 < ns)
    def _():
        start_step(c + 1, jax.lax.rem(c + 1, 2))

    acc[:] = jnp.zeros_like(acc)

    prec = jax.lax.Precision.HIGHEST if gbuf.dtype == jnp.float32 else None
    for m in range(m_max):
        @pl.when(m < tcnt_ref[c])
        def _(m=m):
            for d in tile_dmas(c, m, slot):
                d.wait()
            rows = pl.ds((slot * m_max + m) * block, block)
            acc[:] += jax.lax.dot_general(
                sbuf[rows, :], gbuf[rows, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

    out_ref[:] = acc[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _spmm_t_impl(t_lo, t_cnt, off, xbase, s_mat, g_pad, block, t_sb, m_max):
    ns_blocks = t_lo.shape[0]
    f_pad = g_pad.shape[1]
    _check_vmem("spmm_t", 2 * m_max * block * (
        block * s_mat.dtype.itemsize + f_pad * g_pad.dtype.itemsize
    ) + block * f_pad * 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # S stays in HBM; tiles DMA'd
            pl.BlockSpec(memory_space=pl.ANY),  # g likewise
        ],
        out_specs=pl.BlockSpec((block, f_pad), lambda c, *_: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * m_max * block, block), s_mat.dtype),
            pltpu.VMEM((2 * m_max * block, f_pad), g_pad.dtype),
            pltpu.VMEM((block, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2, m_max, 2)),
        ],
    )
    kernel = functools.partial(_spmm_t_kernel, m_max, t_sb)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns_blocks * block, f_pad),
                                       g_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ns_blocks * block * m_max * block * f_pad,
            bytes_accessed=s_mat.size * s_mat.dtype.itemsize
            + m_max * g_pad.size * g_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(t_lo, t_cnt, off, xbase, s_mat, g_pad)


def _spmm_t_chunked(t_lo, t_cnt, off, xbase, s_mat, g_pad, block, t_sb,
                    m_max):
    f_pad = g_pad.shape[-1]
    impl = _spmm_t_impl_b if g_pad.ndim == 3 else _spmm_t_impl
    outs = []
    for c0 in range(0, f_pad, _F_CHUNK):
        wc = min(_F_CHUNK, f_pad - c0)
        outs.append(impl(t_lo, t_cnt, off, xbase, s_mat,
                         g_pad[..., c0:c0 + wc], block, t_sb, m_max))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


# ----------------------------------------- differentiable S @ X (matvec)


def _matvec_impl(off, xbase, s_mat, x_pad, block, window, t_sb):
    f_pad = x_pad.shape[1]
    outs = []
    for c0 in range(0, f_pad, _F_CHUNK):
        wc = min(_F_CHUNK, f_pad - c0)
        outs.append(_diag_impl(off, xbase, None, s_mat, None, None,
                               x_pad[:, c0:c0 + wc], block, window, t_sb, 0))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _matvec_diff(off, xbase, t_lo, t_cnt, s_mat, x_pad,
                 block, window, t_sb, m_max):
    return _matvec_impl(off, xbase, s_mat, x_pad, block, window, t_sb)


def _matvec_fwd(off, xbase, t_lo, t_cnt, s_mat, x_pad,
                block, window, t_sb, m_max):
    out = _matvec_impl(off, xbase, s_mat, x_pad, block, window, t_sb)
    return out, (off, xbase, t_lo, t_cnt, s_mat, x_pad)


def _matvec_bwd(block, window, t_sb, m_max, res, g):
    off, xbase, t_lo, t_cnt, s_mat, x_pad = res
    g = g.astype(x_pad.dtype)
    ds = _sddmm_chunked(off, xbase, g, x_pad, block, window, t_sb)
    dx = _spmm_t_chunked(t_lo, t_cnt, off, xbase, s_mat, g, block, t_sb,
                         m_max)
    return (None, None, None, None,
            ds.astype(s_mat.dtype), dx.astype(x_pad.dtype))


_matvec_diff.defvjp(_matvec_fwd, _matvec_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _sddmm_diff(off, xbase, t_lo, t_cnt, a_pad, k_pad,
                block, window, t_sb, m_max):
    return _sddmm_chunked(off, xbase, a_pad, k_pad, block, window, t_sb)


def _sddmm_fwd(off, xbase, t_lo, t_cnt, a_pad, k_pad,
               block, window, t_sb, m_max):
    out = _sddmm_chunked(off, xbase, a_pad, k_pad, block, window, t_sb)
    return out, (off, xbase, t_lo, t_cnt, a_pad, k_pad)


def _sddmm_bwd(block, window, t_sb, m_max, res, g):
    off, xbase, t_lo, t_cnt, a_pad, k_pad = res
    gs = g.astype(k_pad.dtype)
    da = _matvec_impl(off, xbase, gs, k_pad, block, window, t_sb)
    dk = _spmm_t_chunked(t_lo, t_cnt, off, xbase, gs, a_pad, block, t_sb,
                         m_max)
    return (None, None, None, None,
            da.astype(a_pad.dtype), dk.astype(k_pad.dtype))


_sddmm_diff.defvjp(_sddmm_fwd, _sddmm_bwd)


# ------------------------------------------------------------ public API


def _require_tables(graph: DiagWindowGraph, who: str) -> None:
    if not isinstance(graph, DiagWindowGraph):
        raise TypeError(f"{who} needs a DiagWindowGraph, got "
                        f"{type(graph).__name__}")
    if graph.t_max == 0:
        raise ValueError(
            f"{who} needs transpose tables — build the graph with "
            "to_diag_window(..., transpose_tables=True) or wrap it with "
            "diag_transpose_tables(graph)"
        )


def _pad_rows(x: Array, rows: int, f_pad: int) -> Array:
    n, f = x.shape[-2:]
    out = jnp.zeros(x.shape[:-2] + (rows, f_pad), x.dtype)
    return out.at[..., : min(n, rows), :f].set(x[..., : min(n, rows), :])


def diag_sddmm(graph: DiagWindowGraph, a: Array, b: Array) -> Array:
    """Window-relative score tile ``out[i, j] = a[i] · b[w_i + j]`` (f32),
    shape ``(num_padded_nodes, window)``. ``a`` is indexed by destination
    row, ``b`` by source row."""
    _require_tables(graph, "diag_sddmm")
    f = a.shape[-1]
    f_pad = _round_up(f, 128)
    ap = _pad_rows(a, graph.num_padded_nodes, f_pad)
    bp = _pad_rows(b, graph.num_src_rows, f_pad)
    return _sddmm_diff(graph.offsets, graph.xbase, graph.t_lo, graph.t_cnt,
                       ap, bp, graph.block_size, graph.window_size,
                       graph.superblock, graph.t_max)


def diag_spmm_t(graph: DiagWindowGraph, s: Array, g: Array) -> Array:
    """Transpose aggregation ``out[j] = Σ_i s[i, j − w_i] · g[i]`` over the
    window-relative tile ``s`` — the adjoint of :func:`diag_matvec` in S."""
    _require_tables(graph, "diag_spmm_t")
    f = g.shape[-1]
    f_pad = _round_up(f, 128)
    gp = _pad_rows(g, graph.num_padded_nodes, f_pad)
    out = _spmm_t_chunked(graph.t_lo, graph.t_cnt, graph.offsets,
                          graph.xbase, s.astype(g.dtype), gp,
                          graph.block_size, graph.superblock, graph.t_max)
    return out[: graph.num_src_rows, :f]


def diag_matvec(graph: DiagWindowGraph, s: Array, x: Array) -> Array:
    """``S @ X`` with a runtime, *differentiable* window-relative ``s``
    (``(num_padded_nodes, window)``) — unlike the aggregation kernels, whose
    S is a constant graph table with a symmetry-based VJP. ``dS`` is an
    SDDMM of the cotangent with ``x``; ``dX`` is the transpose kernel."""
    _require_tables(graph, "diag_matvec")
    n, f = x.shape[-2], x.shape[-1]
    f_pad = _round_up(f, 128)
    xp = _pad_rows(x, graph.num_src_rows, f_pad)
    out = _matvec_diff(graph.offsets, graph.xbase, graph.t_lo, graph.t_cnt,
                       s, xp, graph.block_size, graph.window_size,
                       graph.superblock, graph.t_max)
    return out[: graph.num_nodes, :f]


# ------------------------------------------------------- jnp references


def diag_sddmm_reference(graph: DiagWindowGraph, a: Array, b: Array) -> Array:
    """jnp reference for :func:`diag_sddmm` (CPU tests / golden)."""
    f = a.shape[-1]
    ap = _pad_rows(a, graph.num_padded_nodes, f)
    bp = _pad_rows(b, graph.num_src_rows, f)
    bs, w = graph.block_size, graph.window_size
    outs = []
    for blk in range(graph.num_blocks):
        start = graph.xbase[blk // graph.superblock] + graph.offsets[blk]
        win = jax.lax.dynamic_slice_in_dim(bp, start, w, axis=0)
        a_t = ap[blk * bs:(blk + 1) * bs]
        outs.append(jnp.einsum("bf,wf->bw", a_t.astype(jnp.float32),
                               win.astype(jnp.float32)))
    return jnp.concatenate(outs, axis=0)


def diag_spmm_t_reference(graph: DiagWindowGraph, s: Array, g: Array) -> Array:
    """jnp reference for :func:`diag_spmm_t`."""
    f = g.shape[-1]
    gp = _pad_rows(g, graph.num_padded_nodes, f)
    bs, w = graph.block_size, graph.window_size
    out = jnp.zeros((graph.num_src_rows, f), g.dtype)
    for blk in range(graph.num_blocks):
        start = graph.xbase[blk // graph.superblock] + graph.offsets[blk]
        s_t = s[blk * bs:(blk + 1) * bs].astype(jnp.float32)
        g_t = gp[blk * bs:(blk + 1) * bs].astype(jnp.float32)
        add = jnp.einsum("bw,bf->wf", s_t, g_t)
        cur = jax.lax.dynamic_slice_in_dim(out, start, w, axis=0)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, cur + add.astype(g.dtype), start, axis=0)
    return out


def diag_matvec_reference(graph: DiagWindowGraph, s: Array, x: Array) -> Array:
    """jnp reference for :func:`diag_matvec` (differentiable in ``s``/``x``)."""
    n, f = x.shape[-2], x.shape[-1]
    xp = _pad_rows(x, graph.num_src_rows, f)
    bs, w = graph.block_size, graph.window_size
    outs = []
    for blk in range(graph.num_blocks):
        start = graph.xbase[blk // graph.superblock] + graph.offsets[blk]
        win = jax.lax.dynamic_slice_in_dim(xp, start, w, axis=0)
        outs.append(s[blk * bs:(blk + 1) * bs].astype(x.dtype) @ win)
    return jnp.concatenate(outs, axis=0)[: graph.num_nodes, :f]


# ------------------------------------------- fused attention forward

def _tile_softmax(q_t, kw, mask, scale, prec):
    """Scores matmul + masked softmax for one (rows, window-or-block)
    tile. ``mask`` is the boolean in-window adjacency tile (from the
    streamed bf16 S tile ``!= 0``, or unpacked in-kernel from the 1-bit
    S01 stream on packed graphs). Returns (p, mx, den) — ``p`` is the
    probability tile (f32), ``mx``/``den`` the per-row (rows, 1) f32 max
    and exp-sum softmax stats (``den == 0`` for all-masked rows)."""
    scores = jax.lax.dot_general(
        q_t, kw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale
    logits = jnp.where(mask, scores, jnp.float32(-1e30))
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx) * mask
    den = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(den == 0, 1.0, den)
    return p, mx, den


def _mask_tile(s_ref, t, block, window, mp):
    """Boolean mask tile for destination sub-block ``t``: either the
    streamed bf16/f32 S tile ``!= 0``, or (``mp`` — packed graphs) the
    1-bit tile-ordered S01 rows unpacked in-kernel (the mask stream drops
    16x: 1.9 GB → 120 MB at L9, and with it the dkdv S-tile DMAs)."""
    if mp:
        gpb = block // 8
        return _unpack_s01(s_ref[t * gpb:(t + 1) * gpb, :], block, window,
                           jnp.bool_)
    return s_ref[t * block:(t + 1) * block, :] != 0


def _lane_halves(t):
    """Split a 128-lane tile at lane 64 into its two packed sub-heads.

    Head packing stores TWO dh ≤ 64 attention heads per 128-lane tile
    (sub-head 0 in lanes [0, 64), sub-head 1 in [64, 128); lanes beyond
    each head's dh are zero from the packed projection weights). Every
    contraction below is exact on the packed layout because the masked
    operand zeroes the other sub-head's lanes — e.g.
    ``q_packed @ (k·m0)^T`` contracts q's sub-head-1 lanes against zeros.
    This halves the q/k/v/out/g DMA traffic per head pair (the kernels
    are stream-bound; 4 heads at dh = 64 previously cost 1.7x of 2 heads
    purely from lane padding + per-head streams — VERDICT r4 weak #3).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1)
    lo = jnp.where(lane < 64, t, jnp.zeros_like(t))
    return lo, t - lo


def _attn_fwd_kernel(window, buf, t_sb, num_super, scale, mp,
                     off_ref, xb_ref, q_ref, s_ref, k_hbm, v_hbm,
                     out_ref, kbuf, vbuf, sems):
    """Fully fused windowed-attention forward: per sub-block, one MXU
    matmul for the scores (``Q_block @ K_win^T``), VPU masked softmax on
    the (block, window) tile, and a second MXU matmul ``P @ V_win`` —
    the probability tile never touches HBM. The union K/V windows ride
    the same double-buffered superblock DMA as the v6 SpMM; the mask is
    the streamed GCN S tile (``!= 0`` — structure only)."""
    j = pl.program_id(0)
    block = q_ref.shape[0] // t_sb

    def dma(hbm, dst, sb, slot, k):
        base = pl.multiple_of(xb_ref[sb], block)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(base, buf), :],
            dst.at[pl.ds(slot * buf, buf), :],
            sems.at[slot, k],
        )

    def start(sb, slot):
        dma(k_hbm, kbuf, sb, slot, 0).start()
        dma(v_hbm, vbuf, sb, slot, 1).start()

    @pl.when(j == 0)
    def _():
        start(0, 0)
        if num_super > 1:
            start(jnp.int32(1), 1)

    slot = jax.lax.rem(j, 2)
    dma(k_hbm, kbuf, j, slot, 0).wait()
    dma(v_hbm, vbuf, j, slot, 1).wait()

    prec = jax.lax.Precision.HIGHEST if kbuf.dtype == jnp.float32 else None
    for t in range(t_sb):
        off = pl.multiple_of(off_ref[j * t_sb + t], block)
        kw = kbuf[pl.ds(slot * buf + off, window), :]
        vw = vbuf[pl.ds(slot * buf + off, window), :]
        q_t = q_ref[t * block:(t + 1) * block, :]
        p, _, _ = _tile_softmax(q_t, kw,
                                _mask_tile(s_ref, t, block, window, mp),
                                scale, prec)
        out_ref[t * block:(t + 1) * block, :] = jnp.dot(
            p.astype(kbuf.dtype), vw,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(out_ref.dtype)

    @pl.when(j + 2 < num_super)
    def _():
        start(jnp.minimum(j + 2, num_super - 1), slot)


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def _attn_fwd_impl(off, xbase, q_pad, s_mat, k_pad, v_pad,
                   block, window, t_sb, scale, mp=False):
    n_pad = q_pad.shape[0]
    f_pad = q_pad.shape[1]
    num_super = n_pad // (block * t_sb)
    buf = window + (t_sb - 1) * block
    s_rows = (block * t_sb // 8) if mp else (block * t_sb)

    idx = lambda j, *_: (j, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_super,),
        in_specs=[
            pl.BlockSpec((block * t_sb, f_pad), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, window), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block * t_sb, f_pad), idx,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * buf, f_pad), k_pad.dtype),
            pltpu.VMEM((2 * buf, f_pad), v_pad.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_attn_fwd_kernel, window, buf, t_sb,
                               num_super, scale, mp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), v_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * window * f_pad,
            bytes_accessed=4 * k_pad.size * k_pad.dtype.itemsize
            + s_mat.size * s_mat.dtype.itemsize
            + 2 * n_pad * f_pad * q_pad.dtype.itemsize,
            transcendentals=n_pad * window,
        ),
        interpret=_interpret(),
    )(off, xbase, q_pad, s_mat, k_pad, v_pad)


def _attn_fwd_kernel_b(window, buf, t_sb, num_super, nb, scale, pack, mp,
                       off_ref, xb_ref, q_ref, s_ref, k_hbm, v_hbm,
                       out_ref, kbuf, vbuf, sems):
    """Batched fused forward: 2-D grid ``(num_super, nb)``, batch innermost
    so each (block·t_sb, window) S-mask tile is streamed ONCE per superblock
    and reused across the batch — this is what amortizes the mask stream
    over attention heads/batch (heads fold into the leading axis upstream).
    Per-step VMEM equals the unbatched kernel. With ``pack`` each batch
    item carries two lane-packed sub-heads (see :func:`_lane_halves`):
    two masked softmax+matmul passes per tile, one stream."""
    j = pl.program_id(0)
    b = pl.program_id(1)
    step = j * nb + b
    total = num_super * nb
    block = q_ref.shape[1] // t_sb

    def dma(hbm, dst, s_idx, slot, k):
        jj = s_idx // nb
        bb = jax.lax.rem(s_idx, nb)
        base = pl.multiple_of(xb_ref[jj], block)
        return pltpu.make_async_copy(
            hbm.at[bb, pl.ds(base, buf), :],
            dst.at[pl.ds(slot * buf, buf), :],
            sems.at[slot, k],
        )

    def start(s_idx, slot):
        dma(k_hbm, kbuf, s_idx, slot, 0).start()
        dma(v_hbm, vbuf, s_idx, slot, 1).start()

    @pl.when(step == 0)
    def _():
        start(0, 0)
        if total > 1:
            start(jnp.int32(1), 1)

    slot = jax.lax.rem(step, 2)
    dma(k_hbm, kbuf, step, slot, 0).wait()
    dma(v_hbm, vbuf, step, slot, 1).wait()

    prec = jax.lax.Precision.HIGHEST if kbuf.dtype == jnp.float32 else None
    for t in range(t_sb):
        off = pl.multiple_of(off_ref[j * t_sb + t], block)
        kw = kbuf[pl.ds(slot * buf + off, window), :]
        vw = vbuf[pl.ds(slot * buf + off, window), :]
        q_t = q_ref[0, t * block:(t + 1) * block, :]
        s_t = _mask_tile(s_ref, t, block, window, mp)
        if pack:
            k0, k1 = _lane_halves(kw)
            v0, v1 = _lane_halves(vw)
            p0, _, _ = _tile_softmax(q_t, k0, s_t, scale, prec)
            p1, _, _ = _tile_softmax(q_t, k1, s_t, scale, prec)
            o = (jnp.dot(p0.astype(kbuf.dtype), v0,
                         preferred_element_type=jnp.float32, precision=prec)
                 + jnp.dot(p1.astype(kbuf.dtype), v1,
                           preferred_element_type=jnp.float32,
                           precision=prec))
        else:
            p, _, _ = _tile_softmax(q_t, kw, s_t, scale, prec)
            o = jnp.dot(p.astype(kbuf.dtype), vw,
                        preferred_element_type=jnp.float32, precision=prec)
        out_ref[0, t * block:(t + 1) * block, :] = o.astype(out_ref.dtype)

    @pl.when(step + 2 < total)
    def _():
        start(jnp.minimum(step + 2, total - 1), slot)


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))
def _attn_fwd_impl_b(off, xbase, q_pad, s_mat, k_pad, v_pad,
                     block, window, t_sb, scale, pack=False, mp=False):
    nb, n_pad, f_pad = q_pad.shape
    num_super = n_pad // (block * t_sb)
    buf = window + (t_sb - 1) * block
    s_rows = (block * t_sb // 8) if mp else (block * t_sb)

    s_idx = lambda j, b, *_: (j, 0)  # noqa: E731 — S reused across batch
    q_idx = lambda j, b, *_: (b, j, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_super, nb),
        in_specs=[
            pl.BlockSpec((1, block * t_sb, f_pad), q_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, window), s_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, block * t_sb, f_pad), q_idx,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * buf, f_pad), k_pad.dtype),
            pltpu.VMEM((2 * buf, f_pad), v_pad.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_attn_fwd_kernel_b, window, buf, t_sb,
                               num_super, nb, scale, pack, mp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, n_pad, f_pad), v_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * nb * n_pad * window * f_pad,
            bytes_accessed=4 * k_pad.size * k_pad.dtype.itemsize
            + s_mat.size * s_mat.dtype.itemsize
            + 2 * nb * n_pad * f_pad * q_pad.dtype.itemsize,
            transcendentals=nb * n_pad * window,
        ),
        interpret=_interpret(),
    )(off, xbase, q_pad, s_mat, k_pad, v_pad)


# ------------------------------------- flash backward: dQ (dst side)

# Stats array emitted by the dQ kernel for the source-side dK/dV pass:
# f32 ``(4, N)`` lane-oriented rows — 0 = per-row softmax max ``mx``,
# 1 = exp-sum ``den`` (0 for all-masked rows), 2 = ``delta =
# rowsum(dP * P)``, 3 = sublane padding (Mosaic requires sublane slices
# aligned to 4). Storing (mx, den) rather than their LSE keeps the
# source-side P recompute BIT-IDENTICAL math to the forward — an
# ``mx + log(den)`` round trip doubles the VPU transcendental error and
# was measured at 5e-5 relative on dK/dV vs ~1e-6 for this layout. Lane
# orientation matters twice: a (rows, stat) layout either violates
# Mosaic's 128-lane DMA slice alignment (width < 128) or costs a
# 128-lane broadcast column per stat (196 KB per covering tile — it was
# the src-side pass's single largest operand); and the dQ kernel's
# per-tile (block, 1) stat columns turn into (1, block) lane rows with
# one tiny transpose each before the store.
_STATS_ROWS = 4


def _attn_dq_tile(q_t, kw, vw, mask, g_t, scale, prec):
    """Shared dQ tile computation: masked softmax (as in the forward),
    ``dP = g @ V_win^T`` on the MXU, the softmax cotangent
    ``dL = P ⊙ (dP − delta)·scale`` with ``delta = rowsum(dP ⊙ P)`` on the
    VPU, and ``dQ = dL @ K_win``. Returns (dq_f32, mx, den, delta) — the
    per-row stats the source-side pass needs to recompute P without
    having full rows."""
    p, mx, den = _tile_softmax(q_t, kw, mask, scale, prec)
    dp = jax.lax.dot_general(
        g_t, vw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    dl = p * (dp - delta) * scale
    dq = jnp.dot(dl.astype(kw.dtype), kw,
                 preferred_element_type=jnp.float32, precision=prec)
    return dq, mx, den, delta


def _attn_dq_kernel(window, buf, t_sb, num_super, scale, mp,
                    off_ref, xb_ref, q_ref, g_ref, s_ref,
                    k_hbm, v_hbm, dq_ref, st_ref, kbuf, vbuf, sems):
    """Destination-side half of the flash backward: emits dQ plus the
    per-row softmax stats — unlike the pre-flash backward there is no
    ``(N_pad, window)`` dL/P round trip through HBM (those tiles are
    recomputed in-register source-side by :func:`_attn_dkdv_kernel`,
    which is what the stats output exists for)."""
    j = pl.program_id(0)
    block = q_ref.shape[0] // t_sb

    def dma(hbm, dst, sb, slot, k):
        base = pl.multiple_of(xb_ref[sb], block)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(base, buf), :],
            dst.at[pl.ds(slot * buf, buf), :],
            sems.at[slot, k],
        )

    def start(sb, slot):
        dma(k_hbm, kbuf, sb, slot, 0).start()
        dma(v_hbm, vbuf, sb, slot, 1).start()

    @pl.when(j == 0)
    def _():
        start(0, 0)
        if num_super > 1:
            start(jnp.int32(1), 1)

    slot = jax.lax.rem(j, 2)
    dma(k_hbm, kbuf, j, slot, 0).wait()
    dma(v_hbm, vbuf, j, slot, 1).wait()

    prec = jax.lax.Precision.HIGHEST if kbuf.dtype == jnp.float32 else None
    for t in range(t_sb):
        off = pl.multiple_of(off_ref[j * t_sb + t], block)
        kw = kbuf[pl.ds(slot * buf + off, window), :]
        vw = vbuf[pl.ds(slot * buf + off, window), :]
        rows = slice(t * block, (t + 1) * block)
        dq, mx, den, delta = _attn_dq_tile(q_ref[rows, :], kw, vw,
                                           _mask_tile(s_ref, t, block,
                                                      window, mp),
                                           g_ref[rows, :], scale, prec)
        dq_ref[rows, :] = dq.astype(dq_ref.dtype)
        st_ref[:, rows] = jax.lax.transpose(
            jnp.concatenate([mx, den, delta, mx], axis=1), (1, 0))

    @pl.when(j + 2 < num_super)
    def _():
        start(jnp.minimum(j + 2, num_super - 1), slot)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _attn_dq_impl(off, xbase, q_pad, g_pad, s_mat, k_pad, v_pad,
                  block, window, t_sb, scale, mp=False):
    n_pad = q_pad.shape[0]
    f_pad = q_pad.shape[1]
    num_super = n_pad // (block * t_sb)
    buf = window + (t_sb - 1) * block
    s_rows = (block * t_sb // 8) if mp else (block * t_sb)

    idx = lambda j, *_: (j, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_super,),
        in_specs=[
            pl.BlockSpec((block * t_sb, f_pad), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((block * t_sb, f_pad), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, window), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block * t_sb, f_pad), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((_STATS_ROWS, block * t_sb), lambda j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * buf, f_pad), k_pad.dtype),
            pltpu.VMEM((2 * buf, f_pad), v_pad.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_attn_dq_kernel, window, buf, t_sb,
                               num_super, scale, mp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, f_pad), q_pad.dtype),
            jax.ShapeDtypeStruct((_STATS_ROWS, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n_pad * window * f_pad,
            bytes_accessed=4 * k_pad.size * k_pad.dtype.itemsize
            + s_mat.size * s_mat.dtype.itemsize
            + 3 * n_pad * f_pad * q_pad.dtype.itemsize
            + 4 * n_pad * _STATS_ROWS,
            transcendentals=n_pad * window,
        ),
        interpret=_interpret(),
    )(off, xbase, q_pad, g_pad, s_mat, k_pad, v_pad)


def _attn_dq_kernel_b(window, buf, t_sb, num_super, nb, scale, pack, mp,
                      off_ref, xb_ref, q_ref, g_ref, s_ref,
                      k_hbm, v_hbm, dq_ref, st_ref, kbuf, vbuf, sems):
    """Batched dQ kernel (S-mask tile reused across the batch). With
    ``pack`` each item is two lane-packed sub-heads: two dQ tile passes
    over masked K/V halves, summed dQ (disjoint lanes), and an 8-row
    stats block (rows 0-2 sub-head 0, rows 4-6 sub-head 1)."""
    j = pl.program_id(0)
    b = pl.program_id(1)
    step = j * nb + b
    total = num_super * nb
    block = q_ref.shape[1] // t_sb

    def dma(hbm, dst, s_idx, slot, k):
        jj = s_idx // nb
        bb = jax.lax.rem(s_idx, nb)
        base = pl.multiple_of(xb_ref[jj], block)
        return pltpu.make_async_copy(
            hbm.at[bb, pl.ds(base, buf), :],
            dst.at[pl.ds(slot * buf, buf), :],
            sems.at[slot, k],
        )

    def start(s_idx, slot):
        dma(k_hbm, kbuf, s_idx, slot, 0).start()
        dma(v_hbm, vbuf, s_idx, slot, 1).start()

    @pl.when(step == 0)
    def _():
        start(0, 0)
        if total > 1:
            start(jnp.int32(1), 1)

    slot = jax.lax.rem(step, 2)
    dma(k_hbm, kbuf, step, slot, 0).wait()
    dma(v_hbm, vbuf, step, slot, 1).wait()

    prec = jax.lax.Precision.HIGHEST if kbuf.dtype == jnp.float32 else None
    for t in range(t_sb):
        off = pl.multiple_of(off_ref[j * t_sb + t], block)
        kw = kbuf[pl.ds(slot * buf + off, window), :]
        vw = vbuf[pl.ds(slot * buf + off, window), :]
        rows = slice(t * block, (t + 1) * block)
        s_t = _mask_tile(s_ref, t, block, window, mp)
        if pack:
            k0, k1 = _lane_halves(kw)
            v0, v1 = _lane_halves(vw)
            dq0, mx0, den0, dl0 = _attn_dq_tile(
                q_ref[0, rows, :], k0, v0, s_t,
                g_ref[0, rows, :], scale, prec)
            dq1, mx1, den1, dl1 = _attn_dq_tile(
                q_ref[0, rows, :], k1, v1, s_t,
                g_ref[0, rows, :], scale, prec)
            dq_ref[0, rows, :] = (dq0 + dq1).astype(dq_ref.dtype)
            st_ref[0, :, rows] = jax.lax.transpose(
                jnp.concatenate([mx0, den0, dl0, mx0,
                                 mx1, den1, dl1, mx1], axis=1), (1, 0))
        else:
            dq, mx, den, delta = _attn_dq_tile(q_ref[0, rows, :], kw, vw,
                                               s_t,
                                               g_ref[0, rows, :], scale,
                                               prec)
            dq_ref[0, rows, :] = dq.astype(dq_ref.dtype)
            st_ref[0, :, rows] = jax.lax.transpose(
                jnp.concatenate([mx, den, delta, mx], axis=1), (1, 0))

    @pl.when(step + 2 < total)
    def _():
        start(jnp.minimum(step + 2, total - 1), slot)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12))
def _attn_dq_impl_b(off, xbase, q_pad, g_pad, s_mat, k_pad, v_pad,
                    block, window, t_sb, scale, pack=False, mp=False):
    nb, n_pad, f_pad = q_pad.shape
    num_super = n_pad // (block * t_sb)
    buf = window + (t_sb - 1) * block
    st_rows = 2 * _STATS_ROWS if pack else _STATS_ROWS
    s_rows = (block * t_sb // 8) if mp else (block * t_sb)

    s_idx = lambda j, b, *_: (j, 0)  # noqa: E731 — S reused across batch
    q_idx = lambda j, b, *_: (b, j, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_super, nb),
        in_specs=[
            pl.BlockSpec((1, block * t_sb, f_pad), q_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block * t_sb, f_pad), q_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, window), s_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, block * t_sb, f_pad), q_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, st_rows, block * t_sb),
                         lambda j, b, *_: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * buf, f_pad), k_pad.dtype),
            pltpu.VMEM((2 * buf, f_pad), v_pad.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_attn_dq_kernel_b, window, buf, t_sb,
                               num_super, nb, scale, pack, mp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, n_pad, f_pad), q_pad.dtype),
            jax.ShapeDtypeStruct((nb, st_rows, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * nb * n_pad * window * f_pad,
            bytes_accessed=4 * k_pad.size * k_pad.dtype.itemsize
            + s_mat.size * s_mat.dtype.itemsize
            + 3 * nb * n_pad * f_pad * q_pad.dtype.itemsize
            + 4 * nb * n_pad * _STATS_ROWS,
            transcendentals=nb * n_pad * window,
        ),
        interpret=_interpret(),
    )(off, xbase, q_pad, g_pad, s_mat, k_pad, v_pad)


# ------------------------------- flash backward: dK + dV (src side)


def _attn_dkdv_tile(q_t, g_t, mx_l, den_l, delta_l, k_c, v_c, mask, scale,
                    prec):
    """Shared dK/dV tile computation for one (dst sub-block j, src block
    c) pair, in TRANSPOSED (src-rows, dst-lanes) orientation: recompute
    the P tile from the saved (mx, den) stats
    (``p = exp(logits − mx)·mask / den`` — bit-identical to the forward's
    softmax; no full-row pass is possible source-side, which is why the
    stats exist), ``dP^T = V_c @ G_j^T``, the softmax cotangent
    ``dL^T = P^T ⊙ (dP^T − delta_j)·scale``, and the two accumulator
    contributions ``dK_c += dL^T @ Q_j``, ``dV_c += P^T @ G_j``.

    The transposed orientation exists for the stats: per-dst-row stats
    arrive as ``(3, block)`` lane vectors (row 0 = mx, 1 = den,
    2 = delta) that broadcast along the sublane axis with no relayout,
    so the stats stream is 12 B/row instead of a 128-lane broadcast
    column per stat (1.5 KB vs 196 KB per covering tile — the stats DMA
    was the single largest operand of the un-transposed kernel, 0.76 GB
    of 1.37 GB per L7 d=256 pass). The only relayout left is one
    (block, block) transpose of the boolean mask tile (done at the call
    site — on packed graphs the mask is unpacked in-kernel from S01
    bits first); the accumulator matmuls become standard row-major
    contractions in the bargain."""
    scores = jax.lax.dot_general(
        k_c, q_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale
    logits = jnp.where(mask, scores, jnp.float32(-1e30))
    p = (jnp.exp(logits - mx_l) * mask
         / jnp.where(den_l == 0, 1.0, den_l))
    dp = jax.lax.dot_general(
        v_c, g_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dl = p * (dp - delta_l) * scale
    nn = (((1,), (0,)), ((), ()))
    dk_contrib = jax.lax.dot_general(
        dl.astype(q_t.dtype), q_t, nn,
        preferred_element_type=jnp.float32, precision=prec,
    )
    dv_contrib = jax.lax.dot_general(
        p.astype(g_t.dtype), g_t, nn,
        preferred_element_type=jnp.float32, precision=prec,
    )
    return dk_contrib, dv_contrib


def _attn_dkdv_kernel(m_max, t_sb, scale, mp,
                      tlo_ref, tcnt_ref, off_ref, xb_ref,
                      k_ref, v_ref, s_hbm, q_hbm, g_hbm, st_hbm,
                      dk_ref, dv_ref, sbuf, qbuf, gbuf, stbuf,
                      dkacc, dvacc, sems):
    """Source-side half of the flash backward: ONE pass produces both dK
    and dV by recomputing each ``(dst_block, src_block)`` probability tile
    in-register from the saved stats — replacing the pre-flash pair of
    transpose-SpMM passes over HBM-materialized dL and P. The covering
    sub-blocks of source block ``c`` are the contiguous range
    ``[t_lo[c], t_lo[c]+t_cnt[c])`` (see graph.py diag transpose tables),
    so the inner loop is a bounded static unroll like
    :func:`_spmm_t_kernel`.

    DMA schedule: the whole NEXT grid step's tile set (every covering m,
    all four operands, concurrent) is started while the current step
    computes — per-step buffers alternate on ``c % 2``. Starting a step's
    first tiles at its own beginning (the earlier schedule) stalled every
    step on a full DMA latency before the first matmul, ~2 µs/step of
    dead time on small (32 KB) tiles."""
    c = pl.program_id(0)
    ns = pl.num_programs(0)
    block = dk_ref.shape[0]
    spr = block // 8 if mp else block  # S rows per tile (S01 is 1/8 rows)

    def _rc(cc, m):
        j = tlo_ref[cc] + m
        start_ = xb_ref[j // t_sb] + off_ref[j]
        r0 = pl.multiple_of(j * block, block)
        c0 = pl.multiple_of(cc * block - start_, block)
        sr0 = pl.multiple_of(j * spr, spr)
        return r0, c0, sr0

    def tile_dmas(cc, m, slot):
        r0, c0, sr0 = _rc(cc, m)
        o = (slot * m_max + m) * block
        o_s = (slot * m_max + m) * spr
        return (
            pltpu.make_async_copy(
                s_hbm.at[pl.ds(sr0, spr), pl.ds(c0, block)],
                sbuf.at[pl.ds(o_s, spr), :], sems.at[slot, m, 0]),
            pltpu.make_async_copy(
                q_hbm.at[pl.ds(r0, block), :],
                qbuf.at[pl.ds(o, block), :], sems.at[slot, m, 1]),
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(r0, block), :],
                gbuf.at[pl.ds(o, block), :], sems.at[slot, m, 2]),
            pltpu.make_async_copy(
                st_hbm.at[:, pl.ds(r0, block)],
                stbuf.at[:, pl.ds(o, block)], sems.at[slot, m, 3]),
        )

    def start_step(cc, slot):
        for m in range(m_max):
            @pl.when(m < tcnt_ref[cc])
            def _(m=m):
                for d in tile_dmas(cc, m, slot):
                    d.start()

    slot = jax.lax.rem(c, 2)

    @pl.when(c == 0)
    def _():
        start_step(0, 0)

    @pl.when(c + 1 < ns)
    def _():
        start_step(c + 1, jax.lax.rem(c + 1, 2))

    dkacc[:] = jnp.zeros_like(dkacc)
    dvacc[:] = jnp.zeros_like(dvacc)

    prec = jax.lax.Precision.HIGHEST if qbuf.dtype == jnp.float32 else None
    for m in range(m_max):
        @pl.when(m < tcnt_ref[c])
        def _(m=m):
            for d in tile_dmas(c, m, slot):
                d.wait()
            o = slot * m_max * block + m * block
            rows = pl.ds(o, block)
            s_rows = pl.ds((slot * m_max + m) * spr, spr)
            # Transpose BEFORE the != 0 compare: Mosaic cannot legalize
            # tpu.transpose on i1 vectors, so the relayout must happen on
            # the numeric tile (unpack emits bf16 for the same reason).
            if mp:
                m_dst = _unpack_s01(sbuf[s_rows, :], block, block,
                                    jnp.bfloat16)
            else:
                m_dst = sbuf[s_rows, :]
            mask = jax.lax.transpose(m_dst, (1, 0)) != 0
            dk_c, dv_c = _attn_dkdv_tile(
                qbuf[rows, :], gbuf[rows, :],
                stbuf[0:1, rows], stbuf[1:2, rows], stbuf[2:3, rows],
                k_ref[...], v_ref[...], mask, scale, prec)
            dkacc[:] += dk_c
            dvacc[:] += dv_c

    dk_ref[...] = dkacc[:].astype(dk_ref.dtype)
    dv_ref[...] = dvacc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnums=(10, 11, 12, 13, 14))
def _attn_dkdv_impl(t_lo, t_cnt, off, xbase, s_mat, q_pad, g_pad, stats,
                    k_pad, v_pad, block, t_sb, m_max, scale, mp=False):
    ns_blocks = t_lo.shape[0]
    f_pad = q_pad.shape[-1]
    spr = block // 8 if mp else block
    _check_vmem("attn_dkdv", 2 * m_max * (
        spr * block * s_mat.dtype.itemsize
        + block * f_pad * (q_pad.dtype.itemsize + g_pad.dtype.itemsize)
        + block * 4
    ) + 2 * block * f_pad * 4)

    kv_idx = lambda c, *_: (c, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns_blocks,),
        in_specs=[
            pl.BlockSpec((block, f_pad), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, f_pad), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            # (4, n_pad) f32 transposed stats — small enough that ANY
            # would promote it to VMEM, where its lane slices could not
            # be DMA'd; pin to HBM so the (4, block) tile arrives via a
            # real DMA.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((block, f_pad), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((block, f_pad), kv_idx, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * m_max * spr, block), s_mat.dtype),
            pltpu.VMEM((2 * m_max * block, f_pad), q_pad.dtype),
            pltpu.VMEM((2 * m_max * block, f_pad), g_pad.dtype),
            pltpu.VMEM((4, 2 * m_max * block), jnp.float32),
            pltpu.VMEM((block, f_pad), jnp.float32),
            pltpu.VMEM((block, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2, m_max, 4)),
        ],
    )
    kernel = functools.partial(_attn_dkdv_kernel, m_max, t_sb, scale, mp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ns_blocks * block, f_pad), k_pad.dtype),
            jax.ShapeDtypeStruct((ns_blocks * block, f_pad), v_pad.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ns_blocks * block * m_max * block * f_pad,
            bytes_accessed=s_mat.size * s_mat.dtype.itemsize
            + 2 * m_max * q_pad.size * q_pad.dtype.itemsize
            + m_max * stats.size * 4
            + 4 * k_pad.size * k_pad.dtype.itemsize,
            transcendentals=ns_blocks * block * m_max * block,
        ),
        interpret=_interpret(),
    )(t_lo, t_cnt, off, xbase, k_pad, v_pad, s_mat, q_pad, g_pad, stats)


def _attn_dkdv_kernel_b(m_max, t_sb, nb, scale, pack, mp,
                        tlo_ref, tcnt_ref, off_ref, xb_ref,
                        k_ref, v_ref, s_hbm, q_hbm, g_hbm, st_hbm,
                        dk_ref, dv_ref, sbuf, qbuf, gbuf, stbuf,
                        dkacc, dvacc, sems):
    """Batched src-side dK/dV kernel: grid ``(ns_blocks, nb)``; the S-mask
    is structure-only and shared across the batch, so its tile DMA indexes
    the unbatched mask while q/g/stats index batch entry ``b``. Same
    whole-next-step DMA prefetch as the unbatched kernel, over the
    flattened ``(c, b)`` step index. With ``pack``, ALL FOUR row operands
    (q, g, k, v) split into lane halves per sub-head — masking q/g matters
    here because ``dl^T @ q`` would otherwise smear sub-head-0 cotangents
    into sub-head-1's lanes of dK (the contraction is over rows, not
    lanes) — and the stats block is 8 rows (see :func:`_attn_dq_kernel_b`).
    """
    c = pl.program_id(0)
    b = pl.program_id(1)
    ns = pl.num_programs(0)
    step = c * nb + b
    total = ns * nb
    block = dk_ref.shape[1]
    spr = block // 8 if mp else block  # S rows per tile (S01 is 1/8 rows)

    def _rc(cc, m):
        j = tlo_ref[cc] + m
        start_ = xb_ref[j // t_sb] + off_ref[j]
        r0 = pl.multiple_of(j * block, block)
        c0 = pl.multiple_of(cc * block - start_, block)
        sr0 = pl.multiple_of(j * spr, spr)
        return r0, c0, sr0

    def tile_dmas(s_idx, m, slot):
        cc = s_idx // nb
        bb = jax.lax.rem(s_idx, nb)
        r0, c0, sr0 = _rc(cc, m)
        o = (slot * m_max + m) * block
        o_s = (slot * m_max + m) * spr
        return (
            pltpu.make_async_copy(
                s_hbm.at[pl.ds(sr0, spr), pl.ds(c0, block)],
                sbuf.at[pl.ds(o_s, spr), :], sems.at[slot, m, 0]),
            pltpu.make_async_copy(
                q_hbm.at[bb, pl.ds(r0, block), :],
                qbuf.at[pl.ds(o, block), :], sems.at[slot, m, 1]),
            pltpu.make_async_copy(
                g_hbm.at[bb, pl.ds(r0, block), :],
                gbuf.at[pl.ds(o, block), :], sems.at[slot, m, 2]),
            pltpu.make_async_copy(
                st_hbm.at[bb, :, pl.ds(r0, block)],
                stbuf.at[:, pl.ds(o, block)], sems.at[slot, m, 3]),
        )

    def start_step(s_idx, slot):
        cc = s_idx // nb
        for m in range(m_max):
            @pl.when(m < tcnt_ref[cc])
            def _(m=m):
                for d in tile_dmas(s_idx, m, slot):
                    d.start()

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start_step(jnp.int32(0), 0)

    @pl.when(step + 1 < total)
    def _():
        start_step(step + 1, jax.lax.rem(step + 1, 2))

    dkacc[:] = jnp.zeros_like(dkacc)
    dvacc[:] = jnp.zeros_like(dvacc)

    prec = jax.lax.Precision.HIGHEST if qbuf.dtype == jnp.float32 else None
    for m in range(m_max):
        @pl.when(m < tcnt_ref[c])
        def _(m=m):
            for d in tile_dmas(step, m, slot):
                d.wait()
            o = slot * m_max * block + m * block
            rows = pl.ds(o, block)
            s_rows = pl.ds((slot * m_max + m) * spr, spr)
            # see _attn_dkdv_kernel: transpose the numeric tile, then != 0
            # (Mosaic cannot legalize tpu.transpose on i1 vectors)
            if mp:
                m_dst = _unpack_s01(sbuf[s_rows, :], block, block,
                                    jnp.bfloat16)
            else:
                m_dst = sbuf[s_rows, :]
            mask = jax.lax.transpose(m_dst, (1, 0)) != 0
            if pack:
                q0, q1 = _lane_halves(qbuf[rows, :])
                g0, g1 = _lane_halves(gbuf[rows, :])
                k0, k1 = _lane_halves(k_ref[0])
                v0, v1 = _lane_halves(v_ref[0])
                dk0, dv0 = _attn_dkdv_tile(
                    q0, g0, stbuf[0:1, rows], stbuf[1:2, rows],
                    stbuf[2:3, rows], k0, v0, mask, scale, prec)
                dk1, dv1 = _attn_dkdv_tile(
                    q1, g1, stbuf[4:5, rows], stbuf[5:6, rows],
                    stbuf[6:7, rows], k1, v1, mask, scale, prec)
                dkacc[:] += dk0 + dk1
                dvacc[:] += dv0 + dv1
            else:
                dk_c, dv_c = _attn_dkdv_tile(
                    qbuf[rows, :], gbuf[rows, :],
                    stbuf[0:1, rows], stbuf[1:2, rows], stbuf[2:3, rows],
                    k_ref[0], v_ref[0], mask, scale, prec)
                dkacc[:] += dk_c
                dvacc[:] += dv_c

    dk_ref[0] = dkacc[:].astype(dk_ref.dtype)
    dv_ref[0] = dvacc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnums=(10, 11, 12, 13, 14, 15))
def _attn_dkdv_impl_b(t_lo, t_cnt, off, xbase, s_mat, q_pad, g_pad, stats,
                      k_pad, v_pad, block, t_sb, m_max, scale, pack=False,
                      mp=False):
    ns_blocks = t_lo.shape[0]
    nb, _, f_pad = q_pad.shape
    st_rows = 2 * _STATS_ROWS if pack else _STATS_ROWS
    spr = block // 8 if mp else block
    _check_vmem("attn_dkdv_b", 2 * m_max * (
        spr * block * s_mat.dtype.itemsize
        + block * f_pad * (q_pad.dtype.itemsize + g_pad.dtype.itemsize)
        + block * st_rows
    ) + 2 * block * f_pad * 4)

    kv_idx = lambda c, b, *_: (b, c, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns_blocks, nb),
        in_specs=[
            pl.BlockSpec((1, block, f_pad), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, f_pad), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            # see _attn_dkdv_impl: keep the stats array out of VMEM
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, block, f_pad), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, f_pad), kv_idx, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * m_max * spr, block), s_mat.dtype),
            pltpu.VMEM((2 * m_max * block, f_pad), q_pad.dtype),
            pltpu.VMEM((2 * m_max * block, f_pad), g_pad.dtype),
            pltpu.VMEM((st_rows, 2 * m_max * block), jnp.float32),
            pltpu.VMEM((block, f_pad), jnp.float32),
            pltpu.VMEM((block, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2, m_max, 4)),
        ],
    )
    kernel = functools.partial(_attn_dkdv_kernel_b, m_max, t_sb, nb, scale,
                               pack, mp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, ns_blocks * block, f_pad), k_pad.dtype),
            jax.ShapeDtypeStruct((nb, ns_blocks * block, f_pad), v_pad.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * nb * ns_blocks * block * m_max * block * f_pad,
            bytes_accessed=nb * s_mat.size * s_mat.dtype.itemsize
            + 2 * m_max * q_pad.size * q_pad.dtype.itemsize
            + m_max * stats.size * 4
            + 4 * k_pad.size * k_pad.dtype.itemsize,
            transcendentals=nb * ns_blocks * block * m_max * block,
        ),
        interpret=_interpret(),
    )(t_lo, t_cnt, off, xbase, k_pad, v_pad, s_mat, q_pad, g_pad, stats)


def _spmm_t_kernel_b(m_max, t_sb, nb,
                     tlo_ref, tcnt_ref, off_ref, xb_ref, s_hbm, g_hbm,
                     out_ref, sbuf, gbuf, acc, sems):
    """Batched transpose kernel: grid ``(ns_blocks, nb)``; S tiles and g
    tiles are per-batch runtime data, so each (c, b) step runs the same
    covering-range accumulation as the unbatched kernel against batch
    entry ``b``. Same whole-next-step DMA prefetch as the unbatched
    kernel, over the flattened ``(c, b)`` step index."""
    c = pl.program_id(0)
    b = pl.program_id(1)
    ns = pl.num_programs(0)
    step = c * nb + b
    total = ns * nb
    block = out_ref.shape[1]

    def _rc(cc, m):
        j = tlo_ref[cc] + m
        start = xb_ref[j // t_sb] + off_ref[j]
        r0 = pl.multiple_of(j * block, block)
        c0 = pl.multiple_of(cc * block - start, block)
        return r0, c0

    def tile_dmas(s_idx, m, slot):
        cc = s_idx // nb
        bb = jax.lax.rem(s_idx, nb)
        r0, c0 = _rc(cc, m)
        o = (slot * m_max + m) * block
        return (
            pltpu.make_async_copy(
                s_hbm.at[bb, pl.ds(r0, block), pl.ds(c0, block)],
                sbuf.at[pl.ds(o, block), :], sems.at[slot, m, 0]),
            pltpu.make_async_copy(
                g_hbm.at[bb, pl.ds(r0, block), :],
                gbuf.at[pl.ds(o, block), :], sems.at[slot, m, 1]),
        )

    def start_step(s_idx, slot):
        cc = s_idx // nb
        for m in range(m_max):
            @pl.when(m < tcnt_ref[cc])
            def _(m=m):
                for d in tile_dmas(s_idx, m, slot):
                    d.start()

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        start_step(jnp.int32(0), 0)

    @pl.when(step + 1 < total)
    def _():
        start_step(step + 1, jax.lax.rem(step + 1, 2))

    acc[:] = jnp.zeros_like(acc)

    prec = jax.lax.Precision.HIGHEST if gbuf.dtype == jnp.float32 else None
    for m in range(m_max):
        @pl.when(m < tcnt_ref[c])
        def _(m=m):
            for d in tile_dmas(step, m, slot):
                d.wait()
            rows = pl.ds((slot * m_max + m) * block, block)
            acc[:] += jax.lax.dot_general(
                sbuf[rows, :], gbuf[rows, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

    out_ref[0] = acc[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _spmm_t_impl_b(t_lo, t_cnt, off, xbase, s_mat, g_pad, block, t_sb,
                   m_max):
    ns_blocks = t_lo.shape[0]
    nb, _, f_pad = g_pad.shape
    _check_vmem("spmm_t_b", 2 * m_max * block * (
        block * s_mat.dtype.itemsize + f_pad * g_pad.dtype.itemsize
    ) + block * f_pad * 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns_blocks, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, block, f_pad), lambda c, b, *_: (b, c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * m_max * block, block), s_mat.dtype),
            pltpu.VMEM((2 * m_max * block, f_pad), g_pad.dtype),
            pltpu.VMEM((block, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2, m_max, 2)),
        ],
    )
    kernel = functools.partial(_spmm_t_kernel_b, m_max, t_sb, nb)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, ns_blocks * block, f_pad),
                                       g_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * ns_blocks * block * m_max * block * f_pad,
            bytes_accessed=nb * (s_mat.size // nb if nb else 0)
            * s_mat.dtype.itemsize
            + m_max * g_pad.size * g_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(t_lo, t_cnt, off, xbase, s_mat, g_pad)


def _masked_softmax(s_mat, scores: Array) -> Array:
    """Masked softmax over the window axis (f32 in, f32 out)."""
    mask = s_mat != 0
    logits = jnp.where(mask, scores, jnp.float32(-1e30))
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx) * mask
    den = jnp.sum(p, axis=-1, keepdims=True)
    return p / jnp.where(den == 0, 1.0, den)


def _mask_dense(graph: DiagWindowGraph) -> Array:
    """Dense (N_pad, W) 0/1 mask — ``s_mat``, or the S01 bits expanded
    (reference/unfused paths on packed graphs; the fused kernels unpack
    per tile in-kernel instead)."""
    if graph.s_mat is not None:
        return graph.s_mat
    sp = graph.s_pack  # (N_pad//8, W) uint8, tile-ordered (see graph.py)
    block = graph.block_size
    gpb = block // 8
    nb = sp.shape[0] // gpb
    p3 = sp.reshape(nb, gpb, sp.shape[1])
    bits = jnp.stack([(p3 >> b) & 1 for b in range(8)], axis=1)
    return bits.reshape(nb * block, sp.shape[1]).astype(jnp.float32)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def _attn_fused_diff(off, xbase, s_mat, t_lo, t_cnt, qp, kp, vp,
                     block, window, t_sb, m_max, scale, pack=False,
                     mp=False):
    if pack:
        return _attn_fwd_impl_b(off, xbase, qp, s_mat, kp, vp, block,
                                window, t_sb, scale, True, mp)
    if qp.ndim == 3:
        return _attn_fwd_impl_b(off, xbase, qp, s_mat, kp, vp, block,
                                window, t_sb, scale, False, mp)
    return _attn_fwd_impl(off, xbase, qp, s_mat, kp, vp, block, window,
                          t_sb, scale, mp)


def _attn_fused_fwd(off, xbase, s_mat, t_lo, t_cnt, qp, kp, vp,
                    block, window, t_sb, m_max, scale, pack=False,
                    mp=False):
    out = _attn_fused_diff(off, xbase, s_mat, t_lo, t_cnt, qp, kp, vp,
                           block, window, t_sb, m_max, scale, pack, mp)
    return out, (off, xbase, s_mat, t_lo, t_cnt, qp, kp, vp)


def _attn_fused_bwd(block, window, t_sb, m_max, scale, pack, mp, res, g):
    """Flash-style backward in two kernel passes with NO ``(N_pad, window)``
    intermediate in HBM (the pre-flash design round-tripped bf16 dL and P
    tiles — 2·N·W bytes written + read each — through two transpose-SpMM
    passes): a destination-side pass recomputes P row-wise, emits dQ plus
    the per-row LSE/delta stats, and one source-side pass recomputes P per
    covering tile from those stats and accumulates both dK and dV."""
    off, xbase, s_mat, t_lo, t_cnt, qp, kp, vp = res
    g = g.astype(vp.dtype)
    if qp.ndim == 3:
        dq, stats = _attn_dq_impl_b(off, xbase, qp, g, s_mat, kp, vp,
                                    block, window, t_sb, scale, pack, mp)
        dk, dv = _attn_dkdv_impl_b(t_lo, t_cnt, off, xbase, s_mat, qp, g,
                                   stats, kp, vp, block, t_sb,
                                   m_max, scale, pack, mp)
    else:
        dq, stats = _attn_dq_impl(off, xbase, qp, g, s_mat, kp, vp,
                                  block, window, t_sb, scale, mp)
        dk, dv = _attn_dkdv_impl(t_lo, t_cnt, off, xbase, s_mat, qp, g,
                                 stats, kp, vp, block, t_sb,
                                 m_max, scale, mp)
    return (None, None, None, None, None,
            dq.astype(qp.dtype), dk.astype(kp.dtype), dv.astype(vp.dtype))


_attn_fused_diff.defvjp(_attn_fused_fwd, _attn_fused_bwd)


# -------------------------------------------------- windowed attention


def windowed_attention(graph: DiagWindowGraph, q: Array, k: Array, v: Array,
                       *, scale: "float | None" = None,
                       backend: str = "auto", pack: bool = False) -> Array:
    """Masked softmax attention over each node's in-window neighbourhood.

    ``out[i] = Σ_j P[i, j] v[j]`` with ``P = softmax_j(q[i]·k[j]·scale)``
    over the graph neighbours ``j`` of ``i`` that fall inside ``i``'s
    diagonal window (the mask is ``graph.s_mat != 0`` — structure only, the
    GCN weights are ignored; on ``packed=True`` graphs the kernels unpack
    the 1-bit S01 stream into the mask in-kernel, 16x less mask bandwidth
    and no dense S in HBM at all). Out-of-window escape edges (~2 % at the
    default window on KD-ordered meshes) are excluded by definition —
    windowed attention in the sliding-window-attention sense.

    Fully differentiable in ``q``/``k``/``v``; scores and softmax run in
    f32. Backends: ``"auto"``/``"pallas"`` — the fused forward kernel
    (scores → masked softmax → ``P @ V`` in one pass; P never touches HBM;
    flash-style recompute backward); ``"unfused"`` — the same math as three
    kernel passes with XLA softmax in between (debug/bisect);
    ``"reference"`` — jnp loops (CPU-mesh paths and golden tests).

    ``pack=True`` treats each item as TWO lane-packed sub-heads (dh ≤ 64;
    sub-head 0 at lanes [0, 64), sub-head 1 at [64, 128), zero-padded to
    64 lanes each) attending independently under the shared mask — the
    fused kernels run two masked softmax passes per streamed tile, halving
    q/k/v/out DMA traffic per head pair (see :func:`_lane_halves`).
    Requires an explicit ``scale`` for the true head width.
    """
    if backend != "reference":
        _require_tables(graph, "windowed_attention")
    leading = q.shape[:-2]
    n, f = q.shape[-2:]
    if pack:
        if f != 128:
            raise ValueError(
                f"pack=True expects lane-packed (..., N, 128) q/k/v with "
                f"two sub-heads at lanes [0, 64) and [64, 128); got f={f}")
        if scale is None:
            raise ValueError(
                "pack=True needs an explicit scale (1/sqrt(dh) of the "
                "TRUE head width, not of the packed 128 lanes)")
    if scale is None:
        scale = 1.0 / (f ** 0.5)

    if backend in ("auto", "pallas"):
        # Leading dims (batch, folded heads) ride the batched kernels: one
        # call, 2-D grid, the S-mask tile streamed once per superblock and
        # reused across the batch (was a per-sample Python loop).
        f_pad = _round_up(f, 128)
        qp = _pad_rows(q.reshape((-1,) + q.shape[-2:]) if leading or pack
                       else q, graph.num_padded_nodes, f_pad)
        kp = _pad_rows(k.reshape((-1,) + k.shape[-2:]) if leading or pack
                       else k, graph.num_src_rows, f_pad)
        vp = _pad_rows(v.reshape((-1,) + v.shape[-2:]) if leading or pack
                       else v, graph.num_src_rows, f_pad)
        if pack and qp.ndim == 2:
            qp, kp, vp = qp[None], kp[None], vp[None]
        mp = graph.s_mat is None
        out = _attn_fused_diff(
            graph.offsets, graph.xbase,
            graph.s_pack if mp else graph.s_mat, graph.t_lo,
            graph.t_cnt, qp, kp, vp, graph.block_size, graph.window_size,
            graph.superblock, graph.t_max, float(scale), pack, mp)
        if pack and not leading:
            out = out[0]
        out = out[..., :n, :f]
        if leading:
            out = out.reshape(leading + out.shape[-2:])
        return out

    if pack:
        # Non-kernel backends compute each packed sub-head as an ordinary
        # 64-lane head: split the lane halves onto the leading axis, run
        # unpacked, and re-concatenate — exact, because the packed kernels
        # contract each sub-head only against its own (zero-padded) lanes.
        outs = [
            windowed_attention(graph, q[..., s], k[..., s], v[..., s],
                               scale=scale, backend=backend)
            for s in (slice(0, 64), slice(64, 128))
        ]
        return jnp.concatenate(outs, axis=-1)

    if leading:
        qb = q.reshape((-1,) + q.shape[-2:])
        kb = k.reshape((-1,) + k.shape[-2:])
        vb = v.reshape((-1,) + v.shape[-2:])
        out = jnp.stack([
            windowed_attention(graph, qb[b], kb[b], vb[b], scale=scale,
                               backend=backend)
            for b in range(qb.shape[0])
        ])
        return out.reshape(leading + out.shape[-2:])

    if backend == "reference":
        scores = diag_sddmm_reference(graph, q, k)
    else:
        scores = diag_sddmm(graph, q, k)
    p = _masked_softmax(_mask_dense(graph),
                        scores * jnp.float32(scale)).astype(v.dtype)
    if backend == "reference":
        out = diag_matvec_reference(graph, p, v)
    else:
        out = diag_matvec(graph, p, v)
    return out[:n, :f]
