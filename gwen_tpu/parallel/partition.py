"""Host-side contiguous-chunk graph partitioning for halo-exchange parallelism.

After RCM reordering (``gwen_tpu.graph.reorder``), a weather mesh's adjacency
is banded: edges reach at most ``bandwidth`` positions away. Splitting the
node axis into equal contiguous chunks then guarantees every cross-partition
edge lands within ``halo = bandwidth`` rows of a chunk boundary — the ring
halo exchange in ``gwen_tpu.parallel.halo`` is exact, with no general
all-to-all needed. (Contiguous-chunks-after-RCM plays the role METIS plays in
CPU/GPU graph frameworks, with the decisive TPU advantage that halos are
*contiguous row ranges*: static shapes, one ppermute, no gather.)

All per-partition tables share identical static shapes (max degree, window,
rows), stacked along a leading partition axis so ``shard_map`` can slice them
over the mesh ``graph`` axis.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gwen_tpu.graph.graph import (
    _build_s_ring,
    _sliding_monotonic,
    _sliding_tables,
    ell_tables,
    gcn_normalize,
)
from gwen_tpu.graph.reorder import apply_order, bandwidth, rcm_order


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class PartitionedGraph:
    """Stacked per-partition blocked-ELL tables + the node permutation."""

    nbr: np.ndarray  # (P, n_local, D) int32, ext-space window-relative
    nbr_weight: np.ndarray  # (P, n_local, D) float32
    window_start: np.ndarray  # (P, n_local // block) int32 into ext space
    s_dense: "np.ndarray | None"  # (P, n_local, window) dense scatter matrices
    perm: np.ndarray  # new i = old perm[i]
    inv_perm: np.ndarray
    num_parts: int
    n_local: int
    halo: int
    block_size: int
    window_size: int
    num_nodes: int  # global, before padding
    num_edges: int
    edges_per_part: np.ndarray  # (P,) actual edge counts (incl. self loops)
    # Sliding-ring layout (v4 kernel) — shared static shapes across
    # partitions; None unless built with layout="sliding".
    s_sliding: "np.ndarray | None" = None  # (P, n_local, ring_rows)
    sliding_window_start: "np.ndarray | None" = None  # (P, n_local // block)
    sliding_delta: "np.ndarray | None" = None  # (P, n_local // block) int32
    sliding_window: int = 0
    sliding_ring: int = 0
    sliding_max_delta: int = 0
    layout: str = "ell"

    @property
    def padded_nodes(self) -> int:
        return self.num_parts * self.n_local

    # ------------------------------------------------------------ features
    def pad_nodes(self, x: np.ndarray, node_axis: int = -2) -> np.ndarray:
        """Reorder node data by ``perm`` and zero-pad to ``padded_nodes``."""
        x = np.asarray(x)
        x = np.take(x, self.perm, axis=node_axis)
        pad = self.padded_nodes - x.shape[node_axis]
        if pad:
            widths = [(0, 0)] * x.ndim
            widths[node_axis % x.ndim] = (0, pad)
            x = np.pad(x, widths)
        return x

    def unpad_nodes(self, x: np.ndarray, node_axis: int = -2) -> np.ndarray:
        """Crop padding and restore the original node order."""
        x = np.take(x, np.arange(self.num_nodes), axis=node_axis)
        return np.take(x, self.inv_perm, axis=node_axis)


def partition_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_parts: int,
    *,
    block_size: int = 128,
    self_loops: bool = True,
    reorder: bool = True,
    halo: int | None = None,
    dense_s: bool = False,
    layout: str = "ell",
    s_dtype=np.float32,
    device_build: bool = False,
) -> PartitionedGraph:
    """Partition a (symmetric) graph into ``num_parts`` contiguous chunks.

    ``layout`` picks the local-aggregation tables every partition carries
    (all layouts share identical static shapes so ``shard_map`` can slice
    the stacked arrays over the mesh ``graph`` axis):

    * ``"ell"`` — blocked-ELL only (compact, v1 kernel).
    * ``"dense"`` — + per-partition windowed-dense scatter matrices
      (v3 streamed-S kernel; equivalent to the legacy ``dense_s=True``).
    * ``"sliding"`` — + per-partition sliding-ring tables (v4 kernel — the
      flagship: x read once, S streamed once). The window / ring size /
      max-delta are shared (maxed) across partitions. ``device_build=True``
      expands the stacked S on device from the O(edges) ELL tables — use it
      whenever S is large (L7+), the host→device link is the bottleneck.
    """
    if dense_s:
        layout = "dense"
    if layout not in ("ell", "dense", "sliding"):
        raise ValueError(f"unknown partition layout {layout!r}")
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    if reorder:
        perm = rcm_order(senders, receivers, num_nodes)
        senders, receivers, _ = apply_order(perm, senders, receivers)
    else:
        perm = np.arange(num_nodes, dtype=np.int64)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(num_nodes)

    s, r, w = gcn_normalize(senders, receivers, num_nodes, self_loops=self_loops)

    n_local = _round_up(-(-num_nodes // num_parts), block_size)
    bw = bandwidth(s, r)
    halo_eff = halo if halo is not None else _round_up(max(bw, 1), block_size)
    if halo_eff < bw:
        raise ValueError(f"halo {halo_eff} < graph bandwidth {bw}")
    if halo_eff > n_local:
        raise ValueError(
            f"halo {halo_eff} exceeds partition size {n_local}: too many "
            f"partitions for this graph's bandwidth — reduce num_parts"
        )
    n_ext = n_local + 2 * halo_eff

    part = r // n_local
    per_part = []
    max_deg = 0
    for p in range(num_parts):
        m = part == p
        sp, rp, wp = s[m], r[m], w[m]
        r_rel = rp - p * n_local
        s_rel = sp - (p * n_local - halo_eff)
        if s_rel.size and (s_rel.min() < 0 or s_rel.max() >= n_ext):
            raise AssertionError("edge escapes halo window (bandwidth bound broken)")
        per_part.append((s_rel, r_rel, wp))
        if rp.size:
            max_deg = max(max_deg, int(np.bincount(r_rel, minlength=n_local).max()))
    max_deg = max(_round_up(max_deg, 8), 8)

    # Shared window across partitions: max span per 128-row destination
    # block, computed directly from the edge lists (no table materialization).
    window = block_size
    for s_rel, r_rel, _ in per_part:
        if not len(r_rel):
            continue
        nblk = n_local // block_size
        lo = np.full(nblk, n_ext, np.int64)
        hi = np.zeros(nblk, np.int64)
        blk = r_rel // block_size
        np.minimum.at(lo, blk, s_rel)
        np.maximum.at(hi, blk, s_rel + 1)
        lo = np.where(lo > hi, 0, (lo // block_size) * block_size)
        span = int((hi - lo).max())
        window = max(window, _round_up(span, block_size))
    window = min(window, _round_up(n_ext, block_size))
    nbrs, nws, wss, counts = [], [], [], []
    for s_rel, r_rel, wp in per_part:
        nbr, nw, ws, _, _ = ell_tables(
            s_rel, r_rel, wp, num_dst=n_local, num_src=n_ext,
            block_size=block_size, window_size=window, max_degree=max_deg,
        )
        nbrs.append(nbr)
        nws.append(nw)
        wss.append(ws)
        counts.append(len(wp))

    s_dense = None
    if layout == "dense":
        # Per-partition dense scatter matrices for the streamed-S local
        # kernel (gwen_tpu.ops.spmm_pallas.spmm_windowed_dense).
        s_dense = np.zeros((num_parts, n_local, window), np.float32)
        rows = np.repeat(np.arange(n_local), max_deg)
        for p in range(num_parts):
            np.add.at(
                s_dense[p], (rows, nbrs[p].ravel()), nws[p].ravel()
            )

    s_sliding = sl_ws = sl_delta = None
    sl_window = sl_ring = sl_max_delta = 0
    if layout == "sliding":
        # Two-phase build so the window / ring / max-delta statics are
        # SHARED across partitions (shard_map slices a stacked array).
        src_pad_ext = _round_up(n_ext, block_size)
        monos = [
            _sliding_monotonic(nbrs[p], nws[p], wss[p], block_size)
            for p in range(num_parts)
        ]
        sl_window = max(
            window,
            max(_round_up(req, block_size) for _, _, req in monos),
        )
        sl_window = min(sl_window, src_pad_ext)
        tabs = [
            _sliding_tables(ws_mono, abs_idx, nws[p], sl_window,
                            block_size, src_pad_ext)
            for p, (ws_mono, abs_idx, _) in enumerate(monos)
        ]
        sl_max_delta = max(md for _, _, _, md in tabs)
        sl_ring = sl_window + max(sl_max_delta, 1) * block_size
        s_parts, ws_parts, delta_parts = [], [], []
        for p, (ws_p, delta_p, abs_p, _) in enumerate(tabs):
            cols = abs_p % sl_ring
            s_parts.append(
                _build_s_ring(cols, nws[p], sl_ring, s_dtype, device_build)
            )
            ws_parts.append(ws_p.astype(np.int32))
            delta_parts.append(delta_p)
        if device_build:
            import jax.numpy as jnp

            s_sliding = jnp.stack(s_parts)
        else:
            s_sliding = np.stack(s_parts)
        sl_ws = np.stack(ws_parts)
        sl_delta = np.stack(delta_parts)

    return PartitionedGraph(
        nbr=np.stack(nbrs),
        nbr_weight=np.stack(nws),
        window_start=np.stack(wss),
        s_dense=s_dense,
        perm=perm,
        inv_perm=inv,
        num_parts=num_parts,
        n_local=n_local,
        halo=halo_eff,
        block_size=block_size,
        window_size=window,
        num_nodes=num_nodes,
        num_edges=len(s),
        edges_per_part=np.asarray(counts),
        s_sliding=s_sliding,
        sliding_window_start=sl_ws,
        sliding_delta=sl_delta,
        sliding_window=sl_window,
        sliding_ring=sl_ring,
        sliding_max_delta=max(sl_max_delta, 1) if layout == "sliding" else 0,
        layout=layout,
    )
