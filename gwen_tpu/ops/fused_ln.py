"""Fused residual + LayerNorm Pallas op.

The EncodeProcessDecode process step ends with ``h + layer_norm(m)``
(gnn.py step; reference analog: the per-step norm the reference's GCN
lacks — this is the north-star model's own hot path). Under XLA the chain
upcasts the (N, latent) bf16 aggregation output to f32, runs two reduce
passes and a normalize pass, and re-reads ``h`` for the residual — ~5
full (N, latent) HBM sweeps at L9 (~40 ms of the 113 ms forward is
unfused elementwise traffic; round-4 verdict weak #2). This kernel does
one sweep: read ``m`` and ``h`` once (bf16), normalize in f32 on the VPU,
write the residual-added output once.

Exact same math as ``core.layer_norm_apply`` + residual add: f32
mean/variance over the feature axis, ``eps`` inside the rsqrt, params
applied in f32, cast back to the input dtype.

Backward is a custom VJP (Pallas kernels are not traceable):
``dm = (g' - mean(g') - xhat * mean(g' * xhat)) * rsqrt(var + eps)`` with
``g' = g * scale``, ``dh = g``, ``dscale = sum(g * xhat)``,
``dbias = sum(g)`` — the backward kernel recomputes ``xhat`` from the
saved ``m`` (one extra read instead of an (N, F) f32 residual save) and
emits per-block partial ``dscale``/``dbias`` rows summed by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jnp.ndarray

_BLK = 512  # rows per grid step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_fwd_kernel(eps, nvalid, m_ref, h_ref, sc_ref, bi_ref, out_ref):
    i = pl.program_id(0)
    f = m_ref.shape[1]
    m = m_ref[...].astype(jnp.float32)
    mu = jnp.mean(m, axis=1, keepdims=True)
    d = m - mu
    var = jnp.mean(d * d, axis=1, keepdims=True)
    xhat = d * jax.lax.rsqrt(var + eps)
    out = xhat * sc_ref[...].astype(jnp.float32) + bi_ref[...].astype(
        jnp.float32
    ) + h_ref[...].astype(jnp.float32)
    # Rows past nvalid are padding; their values are never read back but
    # must stay finite (var=0 rows are fine: rsqrt(eps) is finite).
    del i, nvalid, f
    out_ref[...] = out.astype(out_ref.dtype)


def _ln_bwd_kernel(eps, m_ref, g_ref, sc_ref, out_dm, out_ds, out_db):
    i = pl.program_id(0)
    f = m_ref.shape[1]
    m = m_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu = jnp.mean(m, axis=1, keepdims=True)
    d = m - mu
    var = jnp.mean(d * d, axis=1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = d * r
    gs = g * sc_ref[...].astype(jnp.float32)
    gm = jnp.mean(gs, axis=1, keepdims=True)
    gx = jnp.mean(gs * xhat, axis=1, keepdims=True)
    dm = (gs - gm - xhat * gx) * r
    out_dm[...] = dm.astype(out_dm.dtype)
    # dscale/dbias partials accumulate into ONE (8, F) output block with a
    # constant index map (resident in VMEM across the whole grid) — a
    # (1, F) per-block output is not a legal Mosaic block shape (sublane
    # dim must be 8-divisible or the full array), and (nblk, F) with
    # nblk = N/512 wouldn't be either. Row 0 carries the sum (sublane-iota
    # mask); rows 1-7 stay zero; XLA's final sum over 8 rows is trivial.
    @pl.when(i == 0)
    def _():
        out_ds[...] = jnp.zeros_like(out_ds)
        out_db[...] = jnp.zeros_like(out_db)

    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, f), 0) == 0
    ds = jnp.broadcast_to(jnp.sum(g * xhat, axis=0, keepdims=True), (8, f))
    db = jnp.broadcast_to(jnp.sum(g, axis=0, keepdims=True), (8, f))
    out_ds[...] += jnp.where(row0, ds, 0.0)
    out_db[...] += jnp.where(row0, db, 0.0)


def _pad_rows(x2, blk):
    rows = x2.shape[0]
    pad = (-rows) % blk
    if pad:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((pad, x2.shape[1]), x2.dtype)], axis=0
        )
    return x2, rows


@functools.partial(jax.jit, static_argnums=(4,))
def _fwd_impl(m2, h2, scale, bias, eps):
    f = m2.shape[1]
    mp, rows = _pad_rows(m2, _BLK)
    hp, _ = _pad_rows(h2, _BLK)
    nblk = mp.shape[0] // _BLK
    out = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps, rows),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((_BLK, f), lambda i: (i, 0)),
            pl.BlockSpec((_BLK, f), lambda i: (i, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_BLK, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(mp.shape, m2.dtype),
        interpret=_interpret(),
    )(mp, hp, scale.reshape(1, f), bias.reshape(1, f))
    return out[:rows]


@functools.partial(jax.jit, static_argnums=(3,))
def _bwd_impl(m2, g2, scale, eps):
    f = m2.shape[1]
    mp, rows = _pad_rows(m2, _BLK)
    gp, _ = _pad_rows(g2, _BLK)
    nblk = mp.shape[0] // _BLK
    dm, ds, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((_BLK, f), lambda i: (i, 0)),
            pl.BlockSpec((_BLK, f), lambda i: (i, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_BLK, f), lambda i: (i, 0)),
            pl.BlockSpec((8, f), lambda i: (0, 0)),
            pl.BlockSpec((8, f), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(mp.shape, m2.dtype),
            jax.ShapeDtypeStruct((8, f), jnp.float32),
            jax.ShapeDtypeStruct((8, f), jnp.float32),
        ],
        interpret=_interpret(),
    )(mp, gp, scale.reshape(1, f))
    return dm[:rows], jnp.sum(ds, axis=0), jnp.sum(db, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(m, h, scale, bias, eps):
    shape = m.shape
    f = shape[-1]
    out = _fwd_impl(m.reshape(-1, f), h.reshape(-1, f), scale, bias, eps)
    return out.reshape(shape)


def _fused_fwd(m, h, scale, bias, eps):
    return _fused(m, h, scale, bias, eps), (m, scale)


def _fused_bwd(eps, res, g):
    m, scale = res
    shape = m.shape
    f = shape[-1]
    dm, ds, db = _bwd_impl(
        m.reshape(-1, f), g.reshape(-1, f), scale, eps
    )
    return (dm.reshape(shape), g, ds.astype(scale.dtype),
            db.astype(scale.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_residual_layernorm(
    norm_params, m: Array, h: Array, eps: float = 1e-6
) -> Array:
    """``h + layer_norm(m)`` in one HBM sweep (see module docstring).

    Falls back to the unfused jnp composite when the feature axis is not
    lane-aligned (F % 128 != 0) — the kernel's reductions assume no
    padded lanes.
    """
    from gwen_tpu.nn import core

    f = m.shape[-1]
    if f % 128 != 0 or m.shape != h.shape:
        return h + core.layer_norm_apply(norm_params, m, eps=eps)
    return _fused(m, h, norm_params["scale"], norm_params["bias"], eps)
