"""Model tests: shapes, width schedule parity, golden-math checks, grads."""

import jax
import jax.numpy as jnp
import numpy as np

from gwen_tpu.graph import build_graph, complete_edges, to_dense
from gwen_tpu.nn import EncodeProcessDecode, GCNStack, gcn_apply, gcn_init
from gwen_tpu.nn.core import count_params


def _member_graph(n=8):
    s, r = complete_edges(n)
    return build_graph(s, r, n)


def test_width_schedule_matches_reference():
    # Reference: ch_in -> h -> h/2 -> h/4 -> h/2 -> h -> ch_out
    # (models_gnn.py:106-206, active layers only).
    m = GCNStack(channels_in=64, channels_out=5, hidden_feats=32)
    assert m.widths == [64, 32, 16, 8, 16, 32, 5]


def test_gcn_stack_forward_shape():
    g = _member_graph(8)
    m = GCNStack(channels_in=12, channels_out=12, hidden_feats=16)
    params = m.init(jax.random.key(0))
    x = jnp.ones((8, 12))
    out = m.apply(params, g, x)
    assert out.shape == (8, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_gcn_layer_golden_math():
    """GCNConv == D^{-1/2} Â D^{-1/2} X W + b, checked against explicit numpy."""
    n, d_in, d_out = 6, 4, 3
    s, r = complete_edges(n)
    g = build_graph(s, r, n)
    params = gcn_init(jax.random.key(1), d_in, d_out)
    x = np.random.default_rng(2).normal(size=(n, d_in)).astype(np.float32)

    out = gcn_apply(params, g, jnp.asarray(x))

    # numpy golden: normalized adjacency with self loops
    adj = np.ones((n, n), np.float32)  # complete + self loops, deg_hat = n
    adj /= n
    expected = adj @ x @ np.asarray(params["w"]) + np.asarray(params["b"])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_gcn_transform_order_equivalence():
    """Aggregate-then-transform == transform-then-aggregate (linearity)."""
    n = 10
    g = _member_graph(n)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 8)).astype(np.float32))
    p_wide = gcn_init(jax.random.key(0), 8, 16)  # d_out > d_in branch
    p_narrow = gcn_init(jax.random.key(0), 8, 4)  # d_out < d_in branch
    from gwen_tpu.ops import aggregate_segment

    for p in (p_wide, p_narrow):
        got = gcn_apply(p, g, x)
        want = aggregate_segment(g, x) @ p["w"] + p["b"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_encode_process_decode():
    g = _member_graph(8)
    m = EncodeProcessDecode(channels_in=10, channels_out=10, latent_size=16, process_steps=2)
    params = m.init(jax.random.key(0))
    x = jnp.ones((8, 10))
    out = m.apply(params, g, x)
    assert out.shape == (8, 10)
    assert count_params(params) > 0


def test_gradients_flow():
    g = _member_graph(6)
    m = GCNStack(channels_in=5, channels_out=5, hidden_feats=8)
    params = m.init(jax.random.key(0))
    x = jnp.ones((6, 5))
    target_mask = jnp.array([False] * 4 + [True] * 2)

    def loss_fn(p):
        from gwen_tpu.losses import masked_node_l1

        out = m.apply(p, g, x)
        return masked_node_l1(out, x * 0.5, target_mask)

    grads = jax.grad(loss_fn)(params)
    norms = [float(jnp.linalg.norm(g_)) for g_ in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms))
    assert any(v > 0 for v in norms)


def test_dense_graph_model_equivalence():
    """Model on DenseGraph == model on COO Graph (same params)."""
    n = 9
    g = _member_graph(n)
    dg = to_dense(g)
    m = GCNStack(channels_in=7, channels_out=7, hidden_feats=8)
    params = m.init(jax.random.key(3))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(n, 7)).astype(np.float32))
    a = m.apply(params, g, x)
    b = m.apply(params, dg, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_interaction_processor():
    """MeshGraphNets-style edge-MLP processor trains and differs from GCN."""
    import optax

    from gwen_tpu.graph import build_graph, icosphere_edges
    from gwen_tpu.nn.interaction import interaction_apply, interaction_init

    verts, s, r = icosphere_edges(1)
    n = verts.shape[0]
    g = build_graph(s, r, n)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 8)).astype(np.float32))

    p = interaction_init(jax.random.key(0), 8)
    out = interaction_apply(p, g, x)
    assert out.shape == x.shape
    # batched
    xb = jnp.stack([x, x * 2])
    outb = interaction_apply(p, g, xb)
    assert outb.shape == xb.shape
    np.testing.assert_allclose(np.asarray(outb[0]), np.asarray(out), rtol=1e-5)

    model = EncodeProcessDecode(
        channels_in=8, channels_out=8, latent_size=8, process_steps=2,
        processor="interaction",
    )
    params = model.init(jax.random.key(1))
    y = model.apply(params, g, x)
    assert y.shape == x.shape

    # end-to-end gradient step works
    opt = optax.adam(1e-3)
    st = opt.init(params)

    def loss(pp):
        return jnp.mean((model.apply(pp, g, x) - x * 0.5) ** 2)

    l0 = float(loss(params))
    grads = jax.grad(loss)(params)
    updates, st = opt.update(grads, st, params)
    params2 = optax.apply_updates(params, updates)
    assert float(loss(params2)) < l0 + 1e-6
