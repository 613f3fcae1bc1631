"""``gwen-tpu export`` / ``gwen-tpu predict`` — serving artifacts.

Export packages a trained mesh model from the registry into a
self-contained AOT artifact (:mod:`gwen_tpu.serve`); predict loads such an
artifact and runs an autoregressive rollout from an initial state. The
reference has no serving story at all (reload happens inside the training
stack, utils.py:412-442) — this is the production-deployment extension.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from gwen_tpu.config import GwenConfig
from gwen_tpu.logging_utils import get_logger
from gwen_tpu.registry import Registry, default_experiment

log = get_logger()


def export_main(config: GwenConfig, out: str, data: str = "",
                experiment: str = "") -> dict:
    """Load the best mesh-model run, rebuild its serving graph, export."""
    import jax
    import jax.numpy as jnp

    from gwen_tpu.graph import (
        apply_order,
        build_graph,
        icosphere_edges,
        kd_patch_order,
        rcm_order,
        to_diag_window,
    )
    from gwen_tpu.nn import EncodeProcessDecode
    from gwen_tpu.serve import export_model

    registry = Registry(config.run.registry_root)
    experiment = experiment or (
        (config.run.experiment or default_experiment()) + "_MESH")
    params, meta = registry.load_best_model(experiment)

    if data:
        from gwen_tpu.data.meshstore import load_mesh_dataset

        _fields, s, r, verts, _m = load_mesh_dataset(data, lazy=True)
        n = int(max(s.max(), r.max())) + 1
    else:
        verts, s, r = icosphere_edges(int(meta["levels"]))
        n = verts.shape[0]

    processor = config.model.processor
    compute_dtype = (
        jnp.bfloat16 if config.model.compute_dtype == "bfloat16"
        else jnp.float32
    )
    # Serving layout mirrors train-mesh: diag-window (KD order) wherever the
    # Pallas path runs (TPU) or attention demands it; COO/segment elsewhere.
    use_diag = verts is not None and (
        jax.default_backend() == "tpu" or processor == "attention")
    if use_diag:
        perm = kd_patch_order(np.asarray(verts), s, r, n)
    else:
        perm = rcm_order(s, r, n)
    s2, r2, _ = apply_order(perm, s, r)
    g = build_graph(s2, r2, n)
    if use_diag:
        graph = to_diag_window(
            g, window_size=config.mesh.diag_window, dtype=compute_dtype,
            transpose_tables=(processor == "attention"),
        )
        backend = "auto"
    else:
        graph = g
        backend = "segment"

    ch = int(meta["channels"])
    model = EncodeProcessDecode(
        channels_in=ch, channels_out=ch,
        latent_size=int(meta["latent_size"]),
        process_steps=int(meta["process_steps"]),
        mlp_layers=config.model.mlp_layers,
        residual=config.model.residual,
        compute_dtype=compute_dtype,
        backend=backend,
        processor=processor,
        attn_heads=config.model.attn_heads,
    )
    sample = np.zeros((n, ch), np.float32)
    # Node ordering is free to differ from training: every op is per-node or
    # graph-equivariant, so params are order-agnostic as long as the graph
    # and the states use one consistent permutation (saved with the
    # artifact; predict maps in/out of it).
    path = export_model(model, params, graph, sample, out, metadata={
        **meta,
        "experiment": experiment,
        "node_order": "kd" if use_diag else "rcm",
        "processor": processor,
    })
    # The node permutation matters to serve correctly-ordered inputs; store
    # it as its own array (meta.json stays small).
    np.save(Path(path) / "node_perm.npy", np.asarray(perm, np.int64))
    result = {
        "artifact": str(path),
        "nodes": n,
        "channels": ch,
        "platform": jax.default_backend(),
    }
    log.info("exported %s", result)
    return result


def predict_main(artifact: str, input_path: str, steps: int,
                 out: str) -> dict:
    """Load a serving artifact and roll out from an initial state.

    The input is a ``(nodes, channels)`` .npy in *original* node order; the
    artifact's stored permutation maps to/from kernel order.
    """
    from gwen_tpu.serve import ServingModel

    sm = ServingModel.load(artifact)
    x0 = np.load(input_path)
    if tuple(x0.shape) != sm.input_shape:
        raise ValueError(
            f"input shape {x0.shape} != artifact input {sm.input_shape}")
    perm_path = Path(artifact) / "node_perm.npy"
    perm = np.load(perm_path) if perm_path.exists() else None
    if perm is not None and perm.size:
        x0 = x0[perm]
    traj = np.asarray(sm.rollout(x0.astype(np.float32), steps))
    if perm is not None and perm.size:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
        traj = traj[:, inv]
    np.save(out, traj)
    result = {"out": out, "steps": steps, "shape": list(traj.shape)}
    log.info("predicted %s", result)
    return result
