"""SDDMM / transpose-SpMM / windowed-attention tests (interpret mode on CPU;
the same code path compiles with Mosaic on TPU — validated by bench/verify
on device). Golden = dense matrices expanded from the diag-window layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gwen_tpu.graph import (
    apply_order,
    build_graph,
    icosphere_edges,
    kd_patch_order,
    to_diag_window,
)
from gwen_tpu.ops.attention_pallas import (
    diag_matvec,
    diag_matvec_reference,
    diag_sddmm,
    diag_sddmm_reference,
    diag_spmm_t,
    diag_spmm_t_reference,
    windowed_attention,
)


def _diag_graph(levels=3, window=128, block=32, superblock=4):
    verts, s, r = icosphere_edges(levels)
    n = verts.shape[0]
    perm = kd_patch_order(verts, s, r, n, leaf_size=64)
    s, r, _ = apply_order(perm, s, r)
    g = build_graph(s, r, n)
    dw = to_diag_window(g, window_size=window, block_size=block,
                        superblock=superblock, transpose_tables=True)
    return g, dw, n


def _dense_from_layout(dw):
    """Expand the window-relative S tile to a dense (n_pad, src_alloc)."""
    s = np.asarray(dw.s_mat, np.float64)
    bs, w = dw.block_size, dw.window_size
    dense = np.zeros((dw.num_padded_nodes, dw.num_src_rows))
    for blk in range(dw.num_blocks):
        start = int(dw.xbase[blk // dw.superblock]) + int(dw.offsets[blk])
        dense[blk * bs:(blk + 1) * bs, start:start + w] = s[blk * bs:(blk + 1) * bs]
    return dense


def test_transpose_tables_cover_layout():
    _, dw, _ = _diag_graph()
    assert dw.t_max > 0
    # Every (dest block, source block) tile appears exactly once; column
    # offsets recomputed as the kernel does stay inside the window.
    bs, w = dw.block_size, dw.window_size
    starts = [int(dw.xbase[b // dw.superblock]) + int(dw.offsets[b])
              for b in range(dw.num_blocks)]
    seen = set()
    for c in range(dw.t_lo.shape[0]):
        for m in range(int(dw.t_cnt[c])):
            j = int(dw.t_lo[c]) + m
            col = c * bs - starts[j]
            assert 0 <= col <= w - bs
            seen.add((j * bs, c * bs, col))
    expect = set()
    for blk in range(dw.num_blocks):
        for kk in range(w // bs):
            expect.add((blk * bs, starts[blk] + kk * bs, kk * bs))
    assert seen == expect


def test_sddmm_matches_dense():
    _, dw, n = _diag_graph()
    rng = np.random.default_rng(0)
    f = 48
    a = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    got = diag_sddmm(dw, a, b)
    ref = diag_sddmm_reference(dw, a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # Dense golden: scores[i, j] = a[i]·b[w_i + j].
    ap = np.zeros((dw.num_padded_nodes, f)); ap[:n] = np.asarray(a)
    bp = np.zeros((dw.num_src_rows, f)); bp[:n] = np.asarray(b)
    full = ap @ bp.T  # (n_pad, src)
    for blk in range(dw.num_blocks):
        start = int(dw.xbase[blk // dw.superblock]) + int(dw.offsets[blk])
        bs, w = dw.block_size, dw.window_size
        want = full[blk * bs:(blk + 1) * bs, start:start + w]
        np.testing.assert_allclose(
            np.asarray(got)[blk * bs:(blk + 1) * bs], want,
            rtol=1e-4, atol=1e-4)


def test_spmm_t_matches_dense():
    _, dw, n = _diag_graph()
    rng = np.random.default_rng(1)
    f = 40
    g = jnp.asarray(rng.normal(size=(dw.num_padded_nodes, f)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=dw.s_mat.shape).astype(np.float32))
    got = diag_spmm_t(dw, s, g)
    ref = diag_spmm_t_reference(dw, s, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref)[:dw.num_src_rows],
                               rtol=1e-4, atol=1e-4)
    dw2 = dw.replace(s_mat=s)
    dense = _dense_from_layout(dw2)
    want = dense.T @ np.asarray(g, np.float64)
    np.testing.assert_allclose(np.asarray(got), want[:dw.num_src_rows],
                               rtol=1e-4, atol=1e-4)


def test_matvec_forward_and_grads():
    _, dw, n = _diag_graph()
    rng = np.random.default_rng(2)
    f = 36
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=dw.s_mat.shape).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

    got = diag_matvec(dw, s, x)
    ref = diag_matvec_reference(dw, s, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss_k(s_, x_):
        return jnp.sum(diag_matvec(dw, s_, x_) * cot)

    def loss_r(s_, x_):
        return jnp.sum(diag_matvec_reference(dw, s_, x_) * cot)

    gs_k, gx_k = jax.grad(loss_k, argnums=(0, 1))(s, x)
    gs_r, gx_r = jax.grad(loss_r, argnums=(0, 1))(s, x)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs_k), np.asarray(gs_r),
                               rtol=1e-4, atol=1e-4)


def test_windowed_attention_matches_dense_softmax():
    _, dw, n = _diag_graph()
    rng = np.random.default_rng(3)
    f = 32
    q = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    got = windowed_attention(dw, q, k, v)
    ref = windowed_attention(dw, q, k, v, backend="reference")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # Independent dense golden: masked softmax over in-window neighbours.
    dense = _dense_from_layout(dw)  # (n_pad, src)
    mask = dense[:n, :n] != 0
    scores = (np.asarray(q, np.float64) @ np.asarray(k, np.float64).T
              ) / np.sqrt(f)
    scores = np.where(mask, scores, -np.inf)
    scores -= scores.max(axis=1, keepdims=True)
    p = np.exp(scores) * mask
    p /= np.maximum(p.sum(axis=1, keepdims=True), 1e-30)
    want = p @ np.asarray(v, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_windowed_attention_grads_and_batched():
    _, dw, n = _diag_graph()
    rng = np.random.default_rng(4)
    f = 32
    q = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

    def loss(backend):
        def fn(q_, k_, v_):
            out = windowed_attention(dw, q_, k_, v_, backend=backend)
            return jnp.sum(jnp.sin(out))
        return fn

    gk = jax.grad(loss("auto"), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss("reference"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)

    qb = jnp.stack([q, q * 0.5])
    kb = jnp.stack([k, k])
    vb = jnp.stack([v, -v])
    got = windowed_attention(dw, qb, kb, vb)
    assert got.shape == (2, n, f)
    want0 = windowed_attention(dw, qb[0], kb[0], vb[0])
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want0),
                               rtol=1e-5, atol=1e-5)


def test_attention_requires_tables():
    verts, s, r = icosphere_edges(2)
    n = verts.shape[0]
    g = build_graph(s, r, n)
    dw = to_diag_window(g, window_size=128, block_size=32)
    x = jnp.zeros((n, 8), jnp.float32)
    with pytest.raises(ValueError, match="transpose tables"):
        windowed_attention(dw, x, x, x)


def test_attention_four_heads_matches_reference():
    """4 heads at latent 32 → dh=8 ≪ the 128-lane tile: covers the
    sub-lane head-width padding path of the head-sliced einsum
    projections + folded batched kernels (2 heads at dh≥128 is the
    production config; this is the one that exercises f_pad rounding)."""
    from gwen_tpu.nn.attention import graph_attention_apply, graph_attention_init

    _, dw, n = _diag_graph(levels=2, window=128, block=32, superblock=2)
    params = graph_attention_init(jax.random.key(2), 32, heads=4)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(n, 32)),
                    jnp.float32)
    got = graph_attention_apply(params, dw, x, heads=4)
    ref = graph_attention_apply(params, dw, x, heads=4, backend="reference")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss(fn_backend):
        def f(xx):
            return jnp.sum(graph_attention_apply(params, dw, xx, heads=4,
                                                 backend=fn_backend) ** 2)
        return jax.grad(f)(x)

    np.testing.assert_allclose(np.asarray(loss("auto")),
                               np.asarray(loss("reference")),
                               rtol=5e-4, atol=5e-4)


def test_windowed_attention_lane_packed():
    """pack=True: two dh ≤ 64 sub-heads share one 128-lane tile. Golden =
    each sub-head run unpacked through the same kernels; covers fwd +
    q/k/v grads (the dq/dkdv kernels' masked-half math) and the batched
    (leading-axis) path."""
    _, dw, n = _diag_graph()
    rng = np.random.default_rng(7)
    dh = 48  # < 64: pad lanes [48, 64) must stay exactly zero
    scale = 1.0 / np.sqrt(dh)

    def packed(a0, a1):
        z = np.zeros((n, 128), np.float32)
        z[:, :dh] = a0
        z[:, 64:64 + dh] = a1
        return jnp.asarray(z)

    parts = [rng.normal(size=(n, dh)).astype(np.float32) for _ in range(6)]
    q, k, v = (packed(parts[i], parts[i + 3]) for i in range(3))

    got = windowed_attention(dw, q, k, v, scale=scale, pack=True)
    for s, i in ((slice(0, dh), 0), (slice(64, 64 + dh), 3)):
        want = windowed_attention(dw, jnp.asarray(parts[i]),
                                  jnp.asarray(parts[i + 1]),
                                  jnp.asarray(parts[i + 2]), scale=scale)
        np.testing.assert_allclose(np.asarray(got[:, s]), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    # pad lanes of the output are exactly zero
    assert not np.asarray(got[:, dh:64]).any()
    assert not np.asarray(got[:, 64 + dh:]).any()

    def loss(pck, backend="auto"):
        def fn(q_, k_, v_):
            out = windowed_attention(dw, q_, k_, v_, scale=scale,
                                     pack=pck, backend=backend)
            return jnp.sum(jnp.sin(out))
        return fn

    gp = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(True, backend="reference"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)

    # batched packed path: leading axis of packed pairs
    qb = jnp.stack([q, q * 0.5])
    got_b = windowed_attention(dw, qb, jnp.stack([k, k]),
                               jnp.stack([v, -v]), scale=scale, pack=True)
    np.testing.assert_allclose(np.asarray(got_b[0]), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_windowed_attention_packed_mask():
    """Attention over a packed (1-bit S01) diag graph == the same graph
    unpacked: the fused kernels unpack the mask in-kernel (fwd, dq, dkdv),
    and the reference path expands the bits via _mask_dense."""
    g, dw, n = _diag_graph()
    from gwen_tpu.graph import to_diag_window

    dwp = to_diag_window(g, window_size=dw.window_size,
                         block_size=dw.block_size,
                         superblock=dw.superblock,
                         transpose_tables=True, packed=True)
    assert dwp.s_mat is None and dwp.s_pack is not None
    rng = np.random.default_rng(13)
    f = 32
    q, k, v = (jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
               for _ in range(3))

    want = windowed_attention(dw, q, k, v)
    got = windowed_attention(dwp, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    ref = windowed_attention(dwp, q, k, v, backend="reference")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def loss(graph):
        def fn(q_, k_, v_):
            return jnp.sum(jnp.sin(windowed_attention(graph, q_, k_, v_)))
        return fn

    gp = jax.grad(loss(dwp), argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss(dw), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gd, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)

    # packed mask x packed heads compose
    dh = 16
    scale = 1.0 / np.sqrt(dh)
    z = np.zeros((n, 128), np.float32)
    z[:, :dh] = rng.normal(size=(n, dh))
    z[:, 64:64 + dh] = rng.normal(size=(n, dh))
    qq = jnp.asarray(z)
    got2 = windowed_attention(dwp, qq, qq, qq, scale=scale, pack=True)
    want2 = windowed_attention(dw, qq, qq, qq, scale=scale, pack=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-5, atol=1e-5)


def test_graph_attention_pack_override_matches():
    """pack=True (auto at heads=4, dh=8) == pack=False on the same params."""
    from gwen_tpu.nn.attention import graph_attention_apply, graph_attention_init

    _, dw, n = _diag_graph(levels=2, window=128, block=32, superblock=2)
    params = graph_attention_init(jax.random.key(5), 32, heads=4)
    x = jnp.asarray(np.random.default_rng(11).normal(size=(n, 32)),
                    jnp.float32)
    on = graph_attention_apply(params, dw, x, heads=4, pack=True)
    off = graph_attention_apply(params, dw, x, heads=4, pack=False)
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               rtol=2e-5, atol=2e-5)


def test_epd_attention_processor_trains():
    import optax

    from gwen_tpu.nn import EncodeProcessDecode

    _, dw, n = _diag_graph(levels=2, window=128, block=32, superblock=2)
    model = EncodeProcessDecode(channels_in=6, channels_out=6, latent_size=32,
                                process_steps=2, processor="attention",
                                attn_heads=2)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    y = x * 0.7

    out = model.apply(params, dw, x)
    assert out.shape == (n, 6)
    assert np.isfinite(np.asarray(out)).all()

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            return jnp.mean((model.apply(p, dw, x) - y) ** 2)
        lval, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, lval

    losses = []
    for _ in range(5):
        params, opt_state, lval = step(params, opt_state)
        losses.append(float(lval))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_windowed_attention_unfused_matches_fused():
    _, dw, n = _diag_graph()
    rng = np.random.default_rng(6)
    f = 32
    q = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    fused = windowed_attention(dw, q, k, v, backend="auto")
    unfused = windowed_attention(dw, q, k, v, backend="unfused")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               rtol=2e-5, atol=2e-5)

    def loss(backend):
        def fn(q_, k_, v_):
            out = windowed_attention(dw, q_, k_, v_, backend=backend)
            return jnp.sum(jnp.cos(out))
        return fn

    gf = jax.grad(loss("auto"), argnums=(0, 1, 2))(q, k, v)
    gu = jax.grad(loss("unfused"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gu, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
