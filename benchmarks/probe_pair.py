"""Round-5 probe: raise the diag kernel's matmul M without coarsening
window starts (VERDICT r4 #1).

The production diag kernel runs (128, W)x(W, F) sub-block matmuls at ~1/3
MXU peak at L9. Window starts are implicitly diagonal — consecutive blocks
differ by exactly 0 or 128 rows — so adjacent 128-blocks can be fused into
M=256 matmuls two ways:

* ``wide``  — a (256, W+128) pair tile with each half placed at its own
  shift: +33% S bytes and +33% flops, one matmul per pair.
* ``rolled`` — a per-row column roll of S so each pair becomes ONE
  (256, W-128) "middle" matmul (the columns both halves share) plus two
  (128, 128) edge matmuls: SAME S bytes, SAME flops, 2/3 of flops at M=256.

Also ``mmskip`` — the production schedule with 7 of 8 sub-block matmuls
skipped — separating compute cost from the DMA/overhead floor.

Usage:  GWEN_PROBE_LEVELS=7 GWEN_PROBE_VARIANTS=base,rolled,wide,mmskip \
            python benchmarks/probe_pair.py
One JSON line per (level, variant). Variants are checked exact vs the
production kernel (f32, HIGHEST) before timing.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


# ----------------------------------------------------------- pair kernels


def _pair_rolled_kernel(buf, hp, num_super,
                        mo_ref, to_ref, bo_ref, xb_ref,
                        s_ref, x_hbm, out_ref, xbuf, sems):
    """Per pair: mid (256, 256) matmul over the shared columns + two
    (128, 128) edge matmuls. S is the rolled store (see build_rolled)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)

    def dma(sb, slot):
        base = pl.multiple_of(xb_ref[sb], 128)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, buf), :],
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
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32, precision=prec
    )
    for t in range(hp):
        mo = pl.multiple_of(mo_ref[j * hp + t], 128)
        to = pl.multiple_of(to_ref[j * hp + t], 128)
        bo = pl.multiple_of(bo_ref[j * hp + t], 128)
        srows = s_ref[t * 256:(t + 1) * 256, :].astype(xbuf.dtype)
        mid = dot(srows[:, 0:256], xbuf[pl.ds(slot * buf + mo, 256), :])
        et = dot(srows[0:128, 256:384], xbuf[pl.ds(slot * buf + to, 128), :])
        eb = dot(srows[128:256, 256:384], xbuf[pl.ds(slot * buf + bo, 128), :])
        out_ref[t * 256:t * 256 + 128, :] = (
            mid[0:128] + et
        ).astype(out_ref.dtype)
        out_ref[t * 256 + 128:(t + 1) * 256, :] = (
            mid[128:256] + eb
        ).astype(out_ref.dtype)

    @pl.when(j + 2 < num_super)
    def _():
        dma(jnp.minimum(j + 2, num_super - 1), slot).start()


def _pair_wide_kernel(wide, buf, hp, num_super,
                      po_ref, xb_ref, s_ref, x_hbm, out_ref, xbuf, sems):
    """Per pair: ONE (256, wide) matmul against the union window."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)

    def dma(sb, slot):
        base = pl.multiple_of(xb_ref[sb], 128)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, buf), :],
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
    for t in range(hp):
        po = pl.multiple_of(po_ref[j * hp + t], 128)
        srows = s_ref[t * 256:(t + 1) * 256, :].astype(xbuf.dtype)
        acc = jnp.dot(
            srows, xbuf[pl.ds(slot * buf + po, wide), :],
            preferred_element_type=jnp.float32, precision=prec,
        )
        out_ref[t * 256:(t + 1) * 256, :] = acc.astype(out_ref.dtype)

    @pl.when(j + 2 < num_super)
    def _():
        dma(jnp.minimum(j + 2, num_super - 1), slot).start()


def _mmskip_kernel(window, buf, t_sb, num_super,
                   off_ref, xb_ref, s_ref, x_hbm, out_ref, xbuf, sems):
    """Production schedule with only sub-block 0's matmul — diagnostic
    floor (DMA + grid overhead + 1/t_sb of compute). WRONG results."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    block = s_ref.shape[0] // t_sb

    def dma(sb, slot):
        base = pl.multiple_of(xb_ref[sb], block)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(base, buf), :],
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
    off = pl.multiple_of(off_ref[j * t_sb], block)
    xw = xbuf[pl.ds(slot * buf + off, window), :]
    acc = jnp.dot(
        s_ref[0:block, :].astype(xbuf.dtype), xw,
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(out_ref.dtype)
    for t in range(t_sb):
        out_ref[t * block:(t + 1) * block, :] = acc

    @pl.when(j + 2 < num_super)
    def _():
        dma(jnp.minimum(j + 2, num_super - 1), slot).start()


# ------------------------------------------------------------ table builds


def build_pair_offsets(pg):
    """Host-side pair tables from the diag graph's per-block offsets."""
    off = np.asarray(pg.offsets).astype(np.int64)
    t_sb = pg.superblock
    assert t_sb % 2 == 0, "pairing needs an even superblock"
    o0, o1 = off[0::2], off[1::2]
    d1 = o1 - o0
    assert set(np.unique(d1)).issubset({0, 128}), np.unique(d1)
    mo = o0 + d1
    to = np.where(d1 == 128, o0, o0 + 256)
    bo = o0 + d1 + 256
    buf = pg.buf_rows
    # Wide variant: pair base clamped so the 512-wide read stays in the
    # buffer; each half's shift relative to the base is then 0 or 128.
    pb = np.minimum(o0, buf - 512)
    sh_e, sh_o = o0 - pb, o1 - pb
    assert int(max(sh_e.max(initial=0), sh_o.max(initial=0))) <= 128
    assert int(mo.max(initial=0)) <= buf - 256
    assert int(max(to.max(initial=0), bo.max(initial=0))) <= buf - 128
    return (pb.astype(np.int32), sh_e.astype(np.int32),
            sh_o.astype(np.int32), d1.astype(np.int32),
            mo.astype(np.int32), to.astype(np.int32), bo.astype(np.int32))


def build_rolled_s(jnp, s_mat, d1):
    """Device-side rolled S: even rows -> [own d1:d1+256 | own edge slab],
    odd rows -> unchanged [own 0:256 | own 256:384].

    edge slab (even rows) = own [0:128) if d1==128 else own [256:384)."""
    n_pad, W = s_mat.shape
    assert W == 384
    rows = jnp.arange(n_pad, dtype=jnp.int32)
    blk = rows // 128
    even = (blk % 2) == 0
    d_row = jnp.asarray(d1, jnp.int32)[blk // 2]  # (n_pad,)
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    mid_idx = cols + d_row[:, None]          # own col for cols < 256
    edge_idx = jnp.where(d_row[:, None] == 128, cols - 256, cols)
    idx_even = jnp.where(cols < 256, mid_idx, edge_idx)
    idx = jnp.where(even[:, None], idx_even, cols)
    idx = jnp.clip(idx, 0, W - 1)
    return jnp.take_along_axis(s_mat, idx, axis=1)


def build_wide_s(jnp, s_mat, sh_e, sh_o, wide=512):
    """Device-side wide S: each pair half placed at its own shift
    (0 or 128) relative to the clamped pair base."""
    n_pad, W = s_mat.shape
    rows = jnp.arange(n_pad, dtype=jnp.int32)
    blk = rows // 128
    even = (blk % 2) == 0
    d_row = jnp.where(even, jnp.asarray(sh_e, jnp.int32)[blk // 2],
                      jnp.asarray(sh_o, jnp.int32)[blk // 2])
    cols = jnp.arange(wide, dtype=jnp.int32)[None, :]
    src = cols - d_row[:, None]
    valid = (src >= 0) & (src < W)
    out = jnp.take_along_axis(s_mat, jnp.clip(src, 0, W - 1), axis=1)
    return jnp.where(valid, out, jnp.zeros((), s_mat.dtype))


# ------------------------------------------------------------------ impls


def run_variant(name, pg, x_pad, tables):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gwen_tpu.ops.spmm_pallas import _diag_impl, _interpret

    block, W, t_sb = pg.block_size, pg.window_size, pg.superblock
    buf = pg.buf_rows
    n_pad = pg.num_padded_nodes
    f_pad = x_pad.shape[1]
    num_super = n_pad // (block * t_sb)
    hp = t_sb // 2
    idx = lambda j, *_: (j, 0)  # noqa: E731

    if name == "base":
        def call(off, xbase, s_mat, xp):
            return _diag_impl(off, xbase, None, s_mat, None, None, xp,
                              block, W, t_sb, 0)
        return call, (pg.offsets, pg.xbase, pg.s_mat)

    if name == "mmskip":
        def call(off, xbase, s_mat, xp):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(num_super,),
                in_specs=[
                    pl.BlockSpec((block * t_sb, W), idx,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((block * t_sb, f_pad), idx,
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2 * buf, f_pad), xp.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            kernel = functools.partial(_mmskip_kernel, W, buf, t_sb,
                                       num_super)
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), xp.dtype),
                interpret=_interpret(),
            )(off, xbase, s_mat, xp)
        return call, (pg.offsets, pg.xbase, pg.s_mat)

    if name == "rolled":
        pb, sh_e, sh_o, d1, mo, to, bo = tables["pair"]
        s_rolled = tables["s_rolled"]

        def call(mo_, to_, bo_, xbase, s_mat, xp):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(num_super,),
                in_specs=[
                    pl.BlockSpec((block * t_sb, W), idx,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((block * t_sb, f_pad), idx,
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2 * buf, f_pad), xp.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            kernel = functools.partial(_pair_rolled_kernel, buf, hp,
                                       num_super)
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), xp.dtype),
                interpret=_interpret(),
            )(mo_, to_, bo_, xbase, s_mat, xp)
        return call, (mo, to, bo, pg.xbase, s_rolled)

    if name == "wide":
        pb, sh_e, sh_o, d1, mo, to, bo = tables["pair"]
        s_wide = tables["s_wide"]
        wide = int(s_wide.shape[1])

        def call(po_, xbase, s_mat, xp):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(num_super,),
                in_specs=[
                    pl.BlockSpec((block * t_sb, wide), idx,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((block * t_sb, f_pad), idx,
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2 * buf, f_pad), xp.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            kernel = functools.partial(_pair_wide_kernel, wide, buf, hp,
                                       num_super)
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), xp.dtype),
                interpret=_interpret(),
            )(po_, xbase, s_mat, xp)
        return call, (pb, pg.xbase, s_wide)

    raise SystemExit(f"unknown variant {name}")


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("GWEN_PROBE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from kernel_compare import _mesh  # mesh cache helper

    from gwen_tpu.graph import build_graph, to_diag_window
    from gwen_tpu.profiling import scan_timeit

    levels = int(os.environ.get("GWEN_PROBE_LEVELS", "7"))
    feats = int(os.environ.get("GWEN_PROBE_FEATURES", "256"))
    iters = int(os.environ.get("GWEN_PROBE_ITERS", "50"))
    sb = int(os.environ.get("GWEN_PROBE_SB", "8"))
    variants = os.environ.get(
        "GWEN_PROBE_VARIANTS", "base,rolled,wide,mmskip"
    ).split(",")
    dtype = (jnp.bfloat16 if os.environ.get("GWEN_PROBE_DTYPE", "bf16")
             == "bf16" else jnp.float32)
    check = os.environ.get("GWEN_PROBE_CHECK", "1") == "1"

    s, r, n = _mesh(levels, "kd")
    g = build_graph(s, r, n)
    pg = to_diag_window(g, window_size=384, superblock=sb, dtype=dtype,
                        device_build=True)
    n_pad = pg.num_padded_nodes
    f_pad = ((feats + 127) // 128) * 128
    x_pad = jax.random.normal(jax.random.key(0), (n_pad, f_pad),
                              jnp.float32).astype(dtype)

    tables = {"pair": build_pair_offsets(pg)}
    _, sh_e, sh_o, d1 = tables["pair"][:4]

    golden = None
    if check:
        # Mosaic rejects bf16 matmuls under an ambient HIGHEST matmul
        # precision, so compare at native precision; bitwise exactness is
        # established by the f32 interpret-mode run (GWEN_PROBE_CPU=1).
        base_call, base_args = run_variant("base", pg, x_pad, tables)
        golden = jax.jit(base_call)(*base_args, x_pad)  # stays on device

    for name in variants:
        name = name.strip()
        # Build variant S lazily and drop it afterwards — at L9 holding
        # rolled + wide + base S simultaneously is ~7 GB of HBM.
        if name == "rolled":
            tables["s_rolled"] = build_rolled_s(jnp, pg.s_mat, d1)
        elif name == "wide":
            tables["s_wide"] = build_wide_s(jnp, pg.s_mat, sh_e, sh_o)
        call, args = run_variant(name, pg, x_pad, tables)
        if check and name in ("rolled", "wide"):
            # Compare on device; pull ONE scalar (the 168 MB f32 output
            # pulls ~4 MB/s over the tunnel and stall the probe for
            # minutes per check otherwise).
            @jax.jit
            def _relerr(a, b):
                a = a.astype(jnp.float32)
                b = b.astype(jnp.float32)
                return jnp.max(jnp.abs(a - b)) / jnp.maximum(
                    jnp.max(jnp.abs(b)), 1e-9)

            err = float(_relerr(jax.jit(call)(*args, x_pad), golden))
            ok = err < (1e-5 if dtype == jnp.float32 else 2e-2)
            if not ok:
                print(json.dumps({"variant": name, "level": levels,
                                  "check": "FAIL", "rel_err": err}),
                      flush=True)
                continue
        else:
            err = None

        t = scan_timeit(lambda c, *a: call(*a, c), x_pad, *args,
                        iters=iters)["mean_s"]
        tables.pop("s_rolled", None)
        tables.pop("s_wide", None)
        print(json.dumps({
            "variant": name, "level": levels, "nodes": n,
            "edges": g.num_edges, "feats": feats,
            "dtype": jnp.dtype(dtype).name, "superblock": sb,
            "ms": round(t * 1e3, 3),
            "rel_err": (round(err, 8) if err is not None else None),
            "gedges_per_s": round(g.num_edges / t / 1e9, 3),
            "ts": round(time.time(), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
