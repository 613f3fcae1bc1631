"""MXU throughput by matmul shape (standalone Pallas probe).

Answers two round-5 design questions with hardware numbers instead of
folklore:

* GCN pairing (VERDICT #1): effective TFLOPS of (M, K) x (K, N) at the
  production shapes — M=128/K=384 (current diag kernel) vs M=256/K=512
  (wide pair) vs M=256/K=256 + M=128/K=128 (rolled pair) — operands
  VMEM-resident, so this is the pure compute rate with no stream.
* Attention head packing (VERDICT #4): does a K=64 contraction cost half
  of K=128 (Mosaic packs the idle K stages) or the same (dh=64 heads pay
  2x per real MAC)?

Each shape runs as its own kernel: a 1-D grid whose every step issues
``reps`` accumulating dots on VMEM-resident operands; timed with
``scan_timeit``. Reported tflops uses the *issued* MAC count.

  GWEN_MXU_SHAPES=128x384x256,256x512x256 python benchmarks/probe_mxu.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_DEFAULT_SHAPES = (
    # GCN diag kernel shapes (bf16, N=F=256)
    "128x384x256",   # current sub-block matmul
    "256x512x256",   # wide pair
    "256x256x256",   # rolled pair middle
    "128x128x256",   # rolled pair edge
    "512x768x256",   # quad (reference point)
    # attention shapes (scores / PV), dh question
    "128x64x384",    # dh=64 score matmul (4 heads @ latent 256)
    "128x128x384",   # dh=128 score matmul (2 heads @ latent 256)
    "128x384x64",    # PV at dv=64
    "128x384x128",   # PV at dv=128
)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gwen_tpu.profiling import scan_timeit

    shapes = os.environ.get("GWEN_MXU_SHAPES")
    shapes = shapes.split(",") if shapes else list(_DEFAULT_SHAPES)
    reps = int(os.environ.get("GWEN_MXU_REPS", "64"))
    steps = int(os.environ.get("GWEN_MXU_STEPS", "256"))
    iters = int(os.environ.get("GWEN_MXU_ITERS", "20"))
    dtype = (jnp.bfloat16 if os.environ.get("GWEN_MXU_DTYPE", "bf16")
             == "bf16" else jnp.float32)

    for spec in shapes:
        m, k, n = (int(v) for v in spec.strip().split("x"))

        def kernel(a_ref, b_ref, out_ref, acc):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            a = a_ref[...]
            b = b_ref[...]
            for _ in range(reps):
                acc[...] += jnp.dot(
                    a, b, preferred_element_type=jnp.float32
                )
            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                out_ref[...] = acc[...].astype(out_ref.dtype)

        @jax.jit
        def call(a, b):
            return pl.pallas_call(
                kernel,
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec((m, k), lambda i: (0, 0)),
                    pl.BlockSpec((k, n), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((m, n), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((m, n), dtype),
                scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
                interpret=jax.default_backend() != "tpu",
            )(a, b)

        key = jax.random.key(0)
        a = (jax.random.normal(key, (m, k), jnp.float32) * 0.1).astype(dtype)
        b = (jax.random.normal(key, (k, n), jnp.float32) * 0.1).astype(dtype)

        # Chain through a: add a tiny multiple of out's top-left tile so the
        # scan can't dedup/hoist the call.
        def body(carry, bb):
            out = call(carry, bb)
            return carry + 0.0 * out[:1, :1].astype(carry.dtype), None

        def chained(c, bb):
            return body(c, bb)[0]

        t = scan_timeit(chained, a, b, iters=iters)["mean_s"]
        macs = steps * reps * m * k * n
        print(json.dumps({
            "shape": f"{m}x{k}x{n}",
            "dtype": jnp.dtype(dtype).name,
            "reps": reps, "steps": steps,
            "us_per_dot": round(t / (steps * reps) * 1e6, 4),
            "tflops": round(2 * macs / t / 1e12, 1),
            "ts": round(time.time(), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
