"""Pallas SpMM kernel equivalence tests (interpreter mode on CPU; the same
code path compiles with Mosaic on TPU — validated by bench/verify on device).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gwen_tpu.graph import (
    apply_order,
    build_graph,
    icosphere_edges,
    rcm_order,
    to_block_ell,
)
from gwen_tpu.ops import aggregate_segment
from gwen_tpu.ops.spmm_pallas import spmm_block_ell


def _mesh_graph(levels=2):
    verts, s, r = icosphere_edges(levels)
    n = verts.shape[0]
    perm = rcm_order(s, r, n)
    s, r, _ = apply_order(perm, s, r)
    g = build_graph(s, r, n)
    return g, to_block_ell(g, block_size=32), n


def test_spmm_matches_segment():
    g, be, n = _mesh_graph()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 24)).astype(np.float32))
    got = spmm_block_ell(be, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_batched():
    g, be, n = _mesh_graph()
    xb = jnp.asarray(np.random.default_rng(1).normal(size=(3, n, 10)).astype(np.float32))
    got = spmm_block_ell(be, xb)
    want = jax.vmap(lambda x: aggregate_segment(g, x))(xb)
    assert got.shape == xb.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_gradient():
    g, be, n = _mesh_graph()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(n, 8)).astype(np.float32))

    f = lambda xx: jnp.sum(jnp.sin(spmm_block_ell(be, xx)))
    fr = lambda xx: jnp.sum(jnp.sin(aggregate_segment(g, xx)))
    ga = jax.grad(f)(x)
    gr = jax.grad(fr)(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), rtol=1e-4, atol=1e-4)


def test_spmm_under_jit():
    g, be, n = _mesh_graph()
    x = jnp.asarray(np.random.default_rng(3).normal(size=(n, 16)).astype(np.float32))
    got = jax.jit(lambda xx: spmm_block_ell(be, xx))(x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------- tile (BSR) kernel


def test_block_tiles_reference_matches_segment():
    from gwen_tpu.graph import to_block_tiles
    from gwen_tpu.ops import aggregate_block_tiles_reference

    g, _, n = _mesh_graph()
    bt = to_block_tiles(g, block_size=32)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(n, 24)).astype(np.float32))
    got = aggregate_block_tiles_reference(bt, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_tiles_matches_segment():
    from gwen_tpu.graph import to_block_tiles
    from gwen_tpu.ops.spmm_pallas import spmm_block_tiles

    g, _, n = _mesh_graph()
    bt = to_block_tiles(g, block_size=32)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(n, 24)).astype(np.float32))
    got = spmm_block_tiles(bt, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_tiles_batched_and_grad():
    from gwen_tpu.graph import to_block_tiles
    from gwen_tpu.ops.spmm_pallas import spmm_block_tiles

    g, _, n = _mesh_graph()
    bt = to_block_tiles(g, block_size=32)
    xb = jnp.asarray(np.random.default_rng(7).normal(size=(2, n, 8)).astype(np.float32))
    got = spmm_block_tiles(bt, xb)
    want = jax.vmap(lambda x: aggregate_segment(g, x))(xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    x = xb[0]
    f = lambda xx: jnp.sum(jnp.cos(spmm_block_tiles(bt, xx)))
    fr = lambda xx: jnp.sum(jnp.cos(aggregate_segment(g, xx)))
    ga = jax.grad(f)(x)
    gr = jax.grad(fr)(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), rtol=1e-4, atol=1e-4)


# ------------------------------------------------------- streamed-S kernel (v3)


def test_spmm_windowed_dense_matches_segment():
    from gwen_tpu.graph import to_windowed_dense
    from gwen_tpu.ops.spmm_pallas import spmm_windowed_dense

    g, _, n = _mesh_graph()
    wd = to_windowed_dense(g, block_size=32)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(n, 24)).astype(np.float32))
    got = spmm_windowed_dense(wd, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_windowed_dense_batched_and_grad():
    from gwen_tpu.graph import to_windowed_dense
    from gwen_tpu.ops.spmm_pallas import spmm_windowed_dense

    g, _, n = _mesh_graph()
    wd = to_windowed_dense(g, block_size=32)
    xb = jnp.asarray(np.random.default_rng(9).normal(size=(2, n, 8)).astype(np.float32))
    got = spmm_windowed_dense(wd, xb)
    want = jax.vmap(lambda x: aggregate_segment(g, x))(xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    x = xb[0]
    f = lambda xx: jnp.sum(jnp.tanh(spmm_windowed_dense(wd, xx)))
    fr = lambda xx: jnp.sum(jnp.tanh(aggregate_segment(g, xx)))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(fr)(x)), rtol=1e-4, atol=1e-4
    )


# --------------------------------------------- sliding-ring streamed-S (v4)


def test_spmm_sliding_dense_matches_segment():
    from gwen_tpu.graph import to_sliding_dense
    from gwen_tpu.ops.spmm_pallas import spmm_sliding_dense

    g, _, n = _mesh_graph()
    sd = to_sliding_dense(g, block_size=32)
    x = jnp.asarray(np.random.default_rng(10).normal(size=(n, 24)).astype(np.float32))
    got = spmm_sliding_dense(sd, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_sliding_dense_batched_and_grad():
    from gwen_tpu.graph import to_sliding_dense
    from gwen_tpu.ops.spmm_pallas import spmm_sliding_dense

    g, _, n = _mesh_graph()
    sd = to_sliding_dense(g, block_size=32)
    xb = jnp.asarray(np.random.default_rng(11).normal(size=(2, n, 8)).astype(np.float32))
    got = spmm_sliding_dense(sd, xb)
    want = jax.vmap(lambda x: aggregate_segment(g, x))(xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    x = xb[0]
    f = lambda xx: jnp.sum(jnp.sin(spmm_sliding_dense(sd, xx)))
    fr = lambda xx: jnp.sum(jnp.sin(aggregate_segment(g, xx)))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(fr)(x)), rtol=1e-4, atol=1e-4
    )


def test_spmm_sliding_dense_larger_mesh():
    # Bigger mesh exercises nontrivial deltas and ring wraparound.
    from gwen_tpu.graph import to_sliding_dense
    from gwen_tpu.ops.spmm_pallas import spmm_sliding_dense

    g, _, n = _mesh_graph(levels=3)
    sd = to_sliding_dense(g, block_size=32)
    assert sd.max_delta_blocks >= 1
    x = jnp.asarray(np.random.default_rng(12).normal(size=(n, 16)).astype(np.float32))
    got = spmm_sliding_dense(sd, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


# ------------------------------------------ int8 rank-1-factored S (v4.2)


def test_rank1_scales_recovered_and_verified():
    from gwen_tpu.graph import rank1_scales

    g, _, n = _mesh_graph()
    a = rank1_scales(g)
    assert a.shape == (n,)
    # icosphere: 12 pentagon nodes (deg 5 → d̂=6), rest hexagons (d̂=7).
    assert np.allclose(np.sort(np.unique(np.round(a, 6))),
                       np.sort(np.unique(np.round(
                           [1 / np.sqrt(6), 1 / np.sqrt(7)], 6))))
    # Non-rank-1 weights must be rejected.
    import pytest
    from gwen_tpu.graph import build_graph

    bad = build_graph(np.array([0, 1, 0, 1]), np.array([1, 0, 0, 1]), 2,
                      normalize=False, weights=np.array([1.0, 2.0, 1.0, 1.0]))
    with pytest.raises(ValueError):
        rank1_scales(bad)


def test_spmm_sliding_rank1_matches_segment():
    from gwen_tpu.graph import to_sliding_rank1
    from gwen_tpu.ops.spmm_pallas import spmm_sliding_rank1

    g, _, n = _mesh_graph(levels=3)
    sr = to_sliding_rank1(g, block_size=32)
    assert sr.core.s_mat.dtype == np.int8
    x = jnp.asarray(np.random.default_rng(13).normal(size=(n, 24)).astype(np.float32))
    got = spmm_sliding_rank1(sr, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    # aggregate() dispatch, both backends.
    from gwen_tpu.ops import aggregate

    got2 = aggregate(sr, x)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), rtol=1e-4, atol=1e-4)
    got3 = aggregate(sr, x, backend="reference")
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_sliding_rank1_batched_and_grad():
    from gwen_tpu.graph import to_sliding_rank1
    from gwen_tpu.ops.spmm_pallas import spmm_sliding_rank1

    g, _, n = _mesh_graph()
    sr = to_sliding_rank1(g, block_size=32)
    xb = jnp.asarray(np.random.default_rng(14).normal(size=(2, n, 8)).astype(np.float32))
    got = spmm_sliding_rank1(sr, xb)
    want = jax.vmap(lambda x: aggregate_segment(g, x))(xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    x = xb[0]
    f = lambda xx: jnp.sum(jnp.sin(spmm_sliding_rank1(sr, xx)))
    fr = lambda xx: jnp.sum(jnp.sin(aggregate_segment(g, xx)))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(fr)(x)), rtol=1e-4, atol=1e-4
    )


# ---------------------------------------------------------------- edge cases


def test_spmm_odd_feature_count():
    """Features not a multiple of 128 pad and crop correctly."""
    from gwen_tpu.ops.spmm_pallas import spmm_block_ell

    g, be, n = _mesh_graph()
    x = jnp.asarray(np.random.default_rng(20).normal(size=(n, 37)).astype(np.float32))
    got = spmm_block_ell(be, x)
    want = aggregate_segment(g, x)
    assert got.shape == (n, 37)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_wide_features_f_tiling():
    """Feature axis wider than f_blk exercises the (block, f-tile) grid."""
    from gwen_tpu.graph import to_windowed_dense
    from gwen_tpu.ops.spmm_pallas import spmm_windowed_dense

    g, _, n = _mesh_graph()
    wd = to_windowed_dense(g, block_size=32)
    x = jnp.asarray(np.random.default_rng(21).normal(size=(n, 300)).astype(np.float32))
    got = spmm_windowed_dense(wd, x, f_blk=128)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_padded_row_input():
    """x already padded to num_padded_nodes keeps padded rows in the output."""
    from gwen_tpu.ops.spmm_pallas import spmm_block_ell

    g, be, n = _mesh_graph()
    n_pad = be.num_padded_nodes
    x = jnp.zeros((n_pad, 16)).at[:n].set(
        jnp.asarray(np.random.default_rng(22).normal(size=(n, 16)).astype(np.float32))
    )
    got = spmm_block_ell(be, x)
    assert got.shape[0] == n_pad
    want = aggregate_segment(g, x[:n])
    np.testing.assert_allclose(np.asarray(got[:n]), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_wrong_rows_raises():
    from gwen_tpu.ops.spmm_pallas import spmm_block_ell

    g, be, n = _mesh_graph()
    with np.testing.assert_raises(ValueError):
        spmm_block_ell(be, jnp.zeros((n + 1, 8)))


def test_spmm_sliding_dense_chunked_paths(monkeypatch):
    """Tiny VMEM ring budget forces both fallbacks: batch chunking (nb_chunk
    < B) and per-sample column chunking — results must match segment."""
    from gwen_tpu.graph import to_sliding_dense
    from gwen_tpu.ops import spmm_pallas
    from gwen_tpu.ops.spmm_pallas import spmm_sliding_dense

    g, _, n = _mesh_graph(levels=3)
    sd = to_sliding_dense(g, block_size=32)
    rng = np.random.default_rng(13)

    # Budget fits exactly one (ring, 128) f32 slab -> batched path splits
    # into single-sample chunks.
    one_slab = sd.ring_rows * 128 * 4
    monkeypatch.setattr(spmm_pallas, "_SLIDING_RING_VMEM_BYTES", one_slab)
    xb = jnp.asarray(rng.normal(size=(3, n, 8)).astype(np.float32))
    got = spmm_sliding_dense(sd, xb)
    want = jax.vmap(lambda x: aggregate_segment(g, x))(xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # Wide unbatched features with the same budget -> column-chunk loop
    # (f_pad 256 > w_chunk 128).
    x = jnp.asarray(rng.normal(size=(n, 200)).astype(np.float32))
    got = spmm_sliding_dense(sd, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # Budget below one slab: batched path falls back to per-sample calls
    # (which then column-chunk internally).
    monkeypatch.setattr(spmm_pallas, "_SLIDING_RING_VMEM_BYTES", one_slab // 2)
    got = spmm_sliding_dense(sd, xb)
    want = jax.vmap(lambda x: aggregate_segment(g, x))(xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # Gradients flow through the chunked paths.
    f = lambda xx: jnp.sum(jnp.sin(spmm_sliding_dense(sd, xx)))
    fr = lambda xx: jnp.sum(jnp.sin(aggregate_segment(g, xx)))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(fr)(x)),
        rtol=1e-4, atol=1e-4,
    )


# ------------------------------------------ bit-packed rank-1 S (v5)


def test_spmm_sliding_packed_matches_segment():
    from gwen_tpu.graph import to_sliding_packed
    from gwen_tpu.ops import aggregate
    from gwen_tpu.ops.spmm_pallas import spmm_sliding_packed

    g, _, n = _mesh_graph(levels=3)
    sp = to_sliding_packed(g, block_size=32)
    assert sp.packed.dtype == np.uint8
    assert sp.packed.shape[0] * 8 == sp.num_padded_nodes
    x = jnp.asarray(np.random.default_rng(15).normal(size=(n, 24)).astype(np.float32))
    want = aggregate_segment(g, x)
    got = spmm_sliding_packed(sp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
    got2 = aggregate(sp, x, backend="reference")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_sliding_packed_batched_and_grad():
    from gwen_tpu.graph import to_sliding_packed
    from gwen_tpu.ops.spmm_pallas import spmm_sliding_packed

    g, _, n = _mesh_graph()
    sp = to_sliding_packed(g, block_size=32)
    xb = jnp.asarray(np.random.default_rng(16).normal(size=(2, n, 8)).astype(np.float32))
    got = spmm_sliding_packed(sp, xb)
    want = jax.vmap(lambda x: aggregate_segment(g, x))(xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    x = xb[0]
    f = lambda xx: jnp.sum(jnp.sin(spmm_sliding_packed(sp, xx)))
    fr = lambda xx: jnp.sum(jnp.sin(aggregate_segment(g, xx)))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(fr)(x)), rtol=1e-4, atol=1e-4
    )


def test_sliding_packed_device_build_matches_host():
    from gwen_tpu.graph import to_sliding_packed

    g, _, n = _mesh_graph()
    host = to_sliding_packed(g, block_size=32)
    dev = to_sliding_packed(g, block_size=32, device_build=True)
    np.testing.assert_array_equal(np.asarray(dev.packed), host.packed)


# -------------------------------- escape-window sliding layout (v6: narrow
# window + symmetrized out-of-window COO fixup; kd_patch_order ordering)


def _kd_escape_graph(levels=3, leaf_size=128, window_size=256, block=32):
    from gwen_tpu.graph import build_graph, kd_patch_order, to_sliding_dense
    from gwen_tpu.graph.build import icosphere_edges

    verts, s, r = icosphere_edges(levels)
    n = verts.shape[0]
    perm = kd_patch_order(verts, s, r, n, leaf_size=leaf_size)
    s, r, _ = apply_order(perm, s, r)
    g = build_graph(s, r, n)
    sd = to_sliding_dense(g, block_size=block, window_size=window_size)
    return g, sd, n


def test_kd_patch_order_is_permutation():
    from gwen_tpu.graph import kd_patch_order
    from gwen_tpu.graph.build import icosphere_edges

    verts, s, r = icosphere_edges(2)
    n = verts.shape[0]
    perm = kd_patch_order(verts, s, r, n, leaf_size=64)
    assert perm.shape == (n,)
    assert np.array_equal(np.sort(perm), np.arange(n))


def test_escape_window_layout_matches_segment():
    g, sd, n = _kd_escape_graph()
    # The narrowed window must actually produce escapes for this test to
    # exercise the fixup path.
    assert sd.escape is not None and sd.escape.num_edges > 0
    # In-window + escape edges account for every edge exactly once.
    s01 = np.asarray(sd.s_mat) != 0
    assert s01.sum() + sd.escape.num_edges == g.num_edges
    from gwen_tpu.ops.spmm_pallas import spmm_sliding_dense

    x = jnp.asarray(np.random.default_rng(21).normal(size=(n, 24)).astype(np.float32))
    got = spmm_sliding_dense(sd, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
    # The jnp reference takes the same composite path.
    from gwen_tpu.ops.aggregate import aggregate_sliding_dense_reference

    ref = aggregate_sliding_dense_reference(sd, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_escape_window_grad_and_batched():
    from gwen_tpu.ops.spmm_pallas import spmm_sliding_dense

    g, sd, n = _kd_escape_graph()
    xb = jnp.asarray(np.random.default_rng(22).normal(size=(2, n, 8)).astype(np.float32))
    got = spmm_sliding_dense(sd, xb)
    want = jax.vmap(lambda x: aggregate_segment(g, x))(xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    x = xb[0]
    f = lambda xx: jnp.sum(jnp.sin(spmm_sliding_dense(sd, xx)))
    fr = lambda xx: jnp.sum(jnp.sin(aggregate_segment(g, xx)))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(fr)(x)), rtol=1e-4, atol=1e-4
    )


def test_escape_set_is_symmetric():
    _, sd, _ = _kd_escape_graph()
    esc = sd.escape
    e = esc.num_edges
    s, r = np.asarray(esc.senders[:e]), np.asarray(esc.receivers[:e])
    fwd = set(zip(s.tolist(), r.tolist()))
    assert all((b, a) in fwd for a, b in fwd), "escape set must be symmetric"


def test_forced_window_start_rejects_escaping_edges():
    import pytest
    from gwen_tpu.graph.graph import ell_tables

    s = np.array([0, 90], np.int64)
    r = np.array([0, 1], np.int64)
    w = np.ones(2, np.float32)
    with pytest.raises(ValueError, match="escape the forced windows"):
        ell_tables(s, r, w, num_dst=2, num_src=128, block_size=32,
                   window_size=64, forced_window_start=np.zeros(1, np.int64))


# -------------------------------- diagonal-window superblock layout (the
# v6 kernel: implicit-diagonal windows, window-relative S, superblocked DMA)


def _kd_diag_graph(levels=3, leaf_size=128, window_size=256, block=32,
                   superblock=4):
    from gwen_tpu.graph import build_graph, kd_patch_order, to_diag_window
    from gwen_tpu.graph.build import icosphere_edges

    verts, s, r = icosphere_edges(levels)
    n = verts.shape[0]
    perm = kd_patch_order(verts, s, r, n, leaf_size=leaf_size)
    s, r, _ = apply_order(perm, s, r)
    g = build_graph(s, r, n)
    dw = to_diag_window(g, window_size=window_size, block_size=block,
                        superblock=superblock)
    return g, dw, n


def test_diag_window_matches_segment():
    from gwen_tpu.ops.spmm_pallas import spmm_diag_window

    g, dw, n = _kd_diag_graph()
    # The narrowed window must produce escapes so the fixup path runs.
    assert dw.escape is not None and dw.escape.num_edges > 0
    s01 = np.asarray(dw.s_mat) != 0
    assert s01.sum() + dw.escape.num_edges == g.num_edges
    x = jnp.asarray(np.random.default_rng(31).normal(size=(n, 24)).astype(np.float32))
    got = spmm_diag_window(dw, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
    # The jnp reference takes the same composite path.
    from gwen_tpu.ops.aggregate import aggregate_diag_window_reference

    ref = aggregate_diag_window_reference(dw, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_diag_window_grad_and_batched():
    from gwen_tpu.ops.spmm_pallas import spmm_diag_window

    g, dw, n = _kd_diag_graph()
    xb = jnp.asarray(np.random.default_rng(32).normal(size=(2, n, 8)).astype(np.float32))
    got = spmm_diag_window(dw, xb)
    want = jax.vmap(lambda x: aggregate_segment(g, x))(xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    x = xb[0]
    f = lambda xx: jnp.sum(jnp.sin(spmm_diag_window(dw, xx)))
    fr = lambda xx: jnp.sum(jnp.sin(aggregate_segment(g, xx)))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(fr)(x)), rtol=1e-4, atol=1e-4
    )


def test_diag_window_aggregate_dispatch():
    from gwen_tpu.ops.aggregate import aggregate

    g, dw, n = _kd_diag_graph()
    x = jnp.asarray(np.random.default_rng(33).normal(size=(n, 16)).astype(np.float32))
    got = aggregate(dw, x)
    ref = aggregate(dw, x, backend="reference")
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_diag_window_superblock_shrinks_on_tiny_graph():
    from gwen_tpu.graph import build_graph, to_diag_window
    from gwen_tpu.graph.build import icosphere_edges
    from gwen_tpu.ops.spmm_pallas import spmm_diag_window

    verts, s, r = icosphere_edges(1)
    n = verts.shape[0]  # 42 nodes — buf would exceed src rows at superblock=8
    perm = rcm_order(s, r, n)
    s, r, _ = apply_order(perm, s, r)
    g = build_graph(s, r, n)
    dw = to_diag_window(g, window_size=128, block_size=32, superblock=8)
    x = jnp.asarray(np.random.default_rng(34).normal(size=(n, 8)).astype(np.float32))
    got = spmm_diag_window(dw, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_escape_build_rejects_asymmetric_weights():
    import pytest

    from gwen_tpu.graph import kd_patch_order, to_diag_window, to_sliding_dense
    from gwen_tpu.graph.build import icosphere_edges
    from gwen_tpu.graph.graph import Graph

    verts, s, r = icosphere_edges(3)
    n = verts.shape[0]
    perm = kd_patch_order(verts, s, r, n, leaf_size=128)
    s, r, _ = apply_order(perm, s, r)
    # Row-normalized D^-1 A weights: symmetric structure, asymmetric weights.
    deg = np.bincount(r, minlength=n).astype(np.float32)
    w = (1.0 / deg[r]).astype(np.float32)
    e = s.shape[0]
    g = Graph(senders=s.astype(np.int32), receivers=r.astype(np.int32),
              weights=w, num_nodes=n, num_edges=e)
    with pytest.raises(ValueError, match="not symmetric"):
        to_sliding_dense(g, block_size=32, window_size=256)
    with pytest.raises(ValueError, match="not symmetric"):
        to_diag_window(g, window_size=256, block_size=32)


def test_diag_window_hierarchical_escape_contraction():
    """esc2: fix computed via compaction gather + banded c2-space sliding
    kernel + gather-back, instead of the per-edge ELL gather. Exact."""
    from gwen_tpu.graph import build_graph, kd_patch_order, to_diag_window
    from gwen_tpu.graph.build import icosphere_edges
    from gwen_tpu.ops.spmm_pallas import spmm_diag_window

    verts, s, r = icosphere_edges(3)
    n = verts.shape[0]
    perm = kd_patch_order(verts, s, r, n, leaf_size=128)
    s, r, _ = apply_order(perm, s, r)
    g = build_graph(s, r, n)
    dw = to_diag_window(g, window_size=256, block_size=32, superblock=4,
                        esc2_min_rows=1)
    assert dw.esc2_graph is not None and dw.esc2_src is not None
    # The c2 contraction covers exactly the escape edges.
    assert dw.esc2_graph.num_edges == dw.escape.num_edges

    x = jnp.asarray(np.random.default_rng(41).normal(size=(n, 24)).astype(np.float32))
    got = spmm_diag_window(dw, x)
    want = aggregate_segment(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    # Gradient through the composite custom VJP (bwd = fwd on cotangent).
    f = lambda xx: jnp.sum(jnp.sin(spmm_diag_window(dw, xx)))
    fr = lambda xx: jnp.sum(jnp.sin(aggregate_segment(g, xx)))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(fr)(x)),
        rtol=1e-4, atol=1e-4,
    )

    # Batched input takes the same path per sample.
    xb = jnp.stack([x, x * 0.25])
    gotb = spmm_diag_window(dw, xb)
    np.testing.assert_allclose(
        np.asarray(gotb), np.asarray(jnp.stack([want, want * 0.25])),
        rtol=1e-4, atol=1e-4,
    )


def test_diag_window_packed_rank1_matches_segment():
    """packed=True (1-bit S01; rank-1 GCN weights rebuilt IN-KERNEL —
    column/row scale streams, escape tables carrying w = a_s) must be
    exact vs segment — fwd, grad, and batched — and must agree between
    host and device(CPU) builds."""
    from gwen_tpu.graph import (
        apply_order,
        build_graph,
        icosphere_edges,
        kd_patch_order,
        to_diag_window,
    )
    from gwen_tpu.ops.spmm_pallas import spmm_diag_window

    verts, s, r = icosphere_edges(3)
    n = verts.shape[0]
    perm = kd_patch_order(verts, s, r, n, leaf_size=64)
    s, r, _ = apply_order(perm, s, r)
    g = build_graph(s, r, n)
    dw = to_diag_window(g, window_size=128, block_size=32, superblock=4,
                        packed=True)
    assert dw.s_mat is None and dw.s_pack is not None
    assert dw.escape is not None and dw.escape.num_edges > 0
    assert dw.s_pack.dtype == np.uint8
    assert dw.s_pack.shape == (dw.num_padded_nodes // 8, dw.window_size)

    x = jnp.asarray(
        np.random.default_rng(51).normal(size=(n, 24)).astype(np.float32)
    )
    want = aggregate_segment(g, x)
    got = spmm_diag_window(dw, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    f = lambda xx: jnp.sum(jnp.sin(spmm_diag_window(dw, xx)))  # noqa: E731
    fr = lambda xx: jnp.sum(jnp.sin(aggregate_segment(g, xx)))  # noqa: E731
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(fr)(x)),
        rtol=1e-4, atol=1e-4,
    )

    xb = jnp.stack([x, x * 0.5])
    gotb = spmm_diag_window(dw, xb)
    np.testing.assert_allclose(
        np.asarray(gotb), np.asarray(jnp.stack([want, want * 0.5])),
        rtol=1e-4, atol=1e-4,
    )

    # Hierarchical (esc2) escape contraction with packed scales: force the
    # banded-skeleton path (normally only large escape sets take it) —
    # its S̃ now carries w = a_s, composed with the in-kernel a_r scale.
    dw2 = to_diag_window(g, window_size=128, block_size=32, superblock=4,
                         packed=True, esc2_min_rows=1)
    assert dw2.esc2_graph is not None
    got2 = spmm_diag_window(dw2, x)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    f2 = lambda xx: jnp.sum(jnp.sin(spmm_diag_window(dw2, xx)))  # noqa: E731
    np.testing.assert_allclose(
        np.asarray(jax.grad(f2)(x)), np.asarray(jax.grad(fr)(x)),
        rtol=1e-4, atol=1e-4,
    )

    # device-build parity (on CPU the "device" is the host backend).
    dw2 = to_diag_window(g, window_size=128, block_size=32, superblock=4,
                         packed=True, device_build=True)
    np.testing.assert_array_equal(np.asarray(dw2.s_pack),
                                  np.asarray(dw.s_pack))

    # packed graphs compose with attention transpose tables (round 5: the
    # fused attention kernels unpack the S01 mask in-kernel); the packed
    # attention golden lives in test_attention.test_windowed_attention_
    # packed_mask.
    dw3 = to_diag_window(g, window_size=128, block_size=32, superblock=4,
                         packed=True, transpose_tables=True)
    assert dw3.t_max > 0 and dw3.s_mat is None
