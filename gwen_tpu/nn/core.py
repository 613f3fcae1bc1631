"""Minimal functional module system.

Models are plain definitions with ``init(key) -> params`` and
``apply(params, ...) -> out``; params are nested-dict pytrees. No framework
magic — explicit pytrees compose cleanly with ``jit``/``pjit``/``shard_map``
and make sharding annotations trivial. (The reference couples model definition
with trainers-as-methods, models_gnn.py:305 — deliberately not replicated, see
SURVEY §1 "notable architectural quirk".)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jnp.ndarray
Params = Dict[str, Any]


def glorot_uniform(key, shape, dtype=jnp.float32) -> Array:
    fan_in, fan_out = shape[0], shape[-1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def linear_init(key, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    return {
        "w": glorot_uniform(key, (d_in, d_out), dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def linear_apply(params: Params, x: Array) -> Array:
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype) + b


def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm_apply(params: Params, x: Array, eps: float = 1e-6) -> Array:
    # Normalize in f32 for stability regardless of compute dtype.
    h = x.astype(jnp.float32)
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + eps)
    h = h * params["scale"] + params["bias"]
    return h.astype(x.dtype)


def mlp_init(key, dims: list[int], dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"layer_{i}": linear_init(k, dims[i], dims[i + 1], dtype)
        for i, k in enumerate(keys)
    }


def mlp_apply(params: Params, x: Array, activation=jax.nn.relu) -> Array:
    n = len(params)
    for i in range(n):
        x = linear_apply(params[f"layer_{i}"], x)
        if i < n - 1:
            x = activation(x)
    return x


def count_params(params: Params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
