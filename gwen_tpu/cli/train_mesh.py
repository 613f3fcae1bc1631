"""Mesh-scale ensemble training orchestrator (the north-star workflow).

No reference analog — this is the scaling extension BASELINE.json demands:
encode-process-decode over a weather mesh graph (Pallas SpMM aggregation on
TPU), next-step training over ensemble members, multi-device via the
(data, graph) mesh with halo-partitioned graph parallelism, and skill
verification of generated ensembles (fair CRPS / RMSE / spread) against a
held-out member.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from gwen_tpu.config import GwenConfig
from gwen_tpu.logging_utils import get_logger, setup_logger
from gwen_tpu.registry import Registry, default_experiment

log = get_logger()


def _pack_mode(mode: str) -> "bool | None":
    """Config ``model.attn_pack`` ("auto"/"on"/"off") → EPD ``attn_pack``
    (None/True/False). Numerics-neutral perf knob — packed and unpacked
    attention compute identical outputs."""
    try:
        return {"auto": None, "on": True, "off": False}[mode]
    except KeyError:
        raise ValueError(
            f"model.attn_pack must be auto/on/off, got {mode!r}") from None


def main(config: GwenConfig, members: int = 4, steps: int = 16, data: str = '') -> dict:
    import jax
    import jax.numpy as jnp

    from gwen_tpu import ensemble
    from gwen_tpu.data.dataset import MeshEnsembleDataset
    from gwen_tpu.data.synthetic import mesh_ensemble_dataset
    from gwen_tpu.graph import (
        apply_order,
        build_graph,
        rcm_order,
        to_sliding_dense,
    )
    from gwen_tpu.nn import EncodeProcessDecode
    from gwen_tpu.parallel import make_partitioned_apply, partition_graph
    from gwen_tpu.train import Trainer, TrainState, make_mesh
    from gwen_tpu.train.checkpoint import Checkpointer

    setup_logger()
    tcfg = config.train
    levels = config.graph.refine

    lazy = bool(data) and config.data.lazy
    if data:
        from gwen_tpu.data.meshstore import load_mesh_dataset

        fields, s, r, verts, _meta = load_mesh_dataset(data, lazy=lazy)
        members = fields.shape[1]
    else:
        fields, verts, s, r = mesh_ensemble_dataset(
            levels=levels, members=members, steps=steps, seed=tcfg.seed
        )
    n = fields.shape[2]
    n_dev = len(jax.devices())
    graph_parts = min(config.mesh.graph_axis, n_dev)
    use_partition = (
        graph_parts > 1 or config.mesh.force_partition
    ) and n_dev % graph_parts == 0
    # Kernel/ordering choice: the diag-window (v6) layout wants the
    # KD-patch ordering (narrow windows, ~2% escapes); everything else
    # (incl. the partitioned path's contiguous chunks) wants RCM.
    kernel = config.mesh.kernel
    processor = config.model.processor
    if processor == "attention":
        # Windowed attention rides the diag-window layout (+ transpose
        # tables for the softmax backward); the partitioned variant needs
        # the diag partition layout (halo = window, attention has no
        # escape term).
        if use_partition and config.mesh.partition_layout != "diag":
            raise ValueError(
                "model.processor='attention' on the partitioned path "
                "requires mesh.partition_layout='diag'; got "
                f"{config.mesh.partition_layout!r}"
            )
        if verts is None:
            raise ValueError(
                "model.processor='attention' needs vertex positions for the "
                "KD-patch diag-window layout"
            )
        if kernel not in ("auto", "diag", "diag_packed"):
            raise ValueError(
                "model.processor='attention' requires mesh.kernel in "
                f"('auto', 'diag', 'diag_packed'); got {kernel!r}"
            )
    use_diag = (
        not use_partition
        and (jax.default_backend() == "tpu" or processor == "attention")
        and kernel in ("auto", "diag", "diag_packed")
        and verts is not None
        # the interaction net's edge MLP rides the COO/segment path — a
        # windowed layout cannot express per-edge features
        and processor != "interaction"
    )
    if kernel == "diag_packed" and processor == "interaction":
        raise ValueError(
            "mesh.kernel='diag_packed' supports model.processor='gcn' and "
            "'attention' (the interaction net rides the segment path)"
        )
    part_diag = (
        use_partition
        and config.mesh.partition_layout == "diag"
        and verts is not None
    )
    if use_diag or part_diag:
        from gwen_tpu.graph import kd_patch_order

        perm = kd_patch_order(np.asarray(verts), s, r, n)
    else:
        perm = rcm_order(s, r, n)
    s2, r2, _ = apply_order(perm, s, r)
    if lazy:
        # Streaming path (data.lazy=true): node reorder composes onto each
        # step read; the archive never materializes in host RAM.
        fields = fields.map(lambda step: np.take(step, perm, axis=1))
    else:
        fields = np.take(fields, perm, axis=2)
    ch = fields.shape[-1]

    compute_dtype = (
        jnp.bfloat16 if config.model.compute_dtype == "bfloat16" else jnp.float32
    )
    model = EncodeProcessDecode(
        channels_in=ch,
        channels_out=ch,
        latent_size=config.model.latent_size,
        process_steps=config.model.process_steps,
        mlp_layers=config.model.mlp_layers,
        residual=config.model.residual,
        remat=tcfg.remat,
        compute_dtype=compute_dtype,
        processor=processor,
        attn_heads=config.model.attn_heads,
        attn_pack=_pack_mode(config.model.attn_pack),
    )

    # Graph tables travel through the jitted steps as the Trainer *context*
    # (arguments, not closed-over constants — mandatory at mesh scale).
    from gwen_tpu.train.tasks import mesh_graph_loss_fn

    if use_partition:
        mesh = make_mesh(data=n_dev // graph_parts, graph=graph_parts)
        # Local layout: sliding-ring (flagship) on TPU; the CPU reference
        # path supports all layouts identically.
        pg = partition_graph(
            s2, r2, n, num_parts=graph_parts, reorder=False,
            layout=config.mesh.partition_layout,
            s_dtype=compute_dtype,
            diag_window=config.mesh.diag_window,
            device_build=(
                config.mesh.device_build
                and jax.default_backend() == "tpu"
                and config.mesh.partition_layout in ("sliding", "diag")
            ),
        )
        apply_fn = make_partitioned_apply(model, pg, mesh)
        if lazy:
            fields = fields.map(lambda s: pg.pad_nodes(s, node_axis=-2))
        else:
            fields = pg.pad_nodes(fields)
        global_graph = build_graph(s2, r2, n)  # for skill eval / calibration
        context = apply_fn.tables

        if tcfg.rollout_horizon > 1:
            from gwen_tpu.train.tasks import partitioned_rollout_loss_fn

            loss_fn = partitioned_rollout_loss_fn(
                apply_fn, tcfg.rollout_horizon,
                loss=tcfg.loss if tcfg.loss in ("mse", "l1") else "mse",
            )
        elif tcfg.loss == "crps-ensemble":
            from gwen_tpu.train.tasks import partitioned_ensemble_crps_loss_fn

            # shard_map constraint: the K-member fan-out batch must divide
            # the data mesh axis. Fail here with the constraint spelled out
            # instead of an opaque sharding error deep inside jit.
            n_data = n_dev // graph_parts
            if (tcfg.batch_size * tcfg.crps_members) % n_data:
                raise ValueError(
                    f"batch_size * crps_members = {tcfg.batch_size} * "
                    f"{tcfg.crps_members} must divide the data mesh axis "
                    f"({n_data}) for partitioned CRPS-ensemble training"
                )
            # Noise correlation over the padded node space (isolated pad
            # rows get white self-loop noise — harmless). Threads through
            # the Trainer context with the tables (jit arguments, never
            # closed-over constants — mesh-scale rule).
            noise_graph = build_graph(s2, r2, fields.shape[2])
            context = (apply_fn.tables, noise_graph)
            loss_fn = partitioned_ensemble_crps_loss_fn(
                apply_fn,
                num_members=tcfg.crps_members, sigma=tcfg.sigma,
            )
        else:
            def loss_fn(params, batch, tables):
                x, y = batch
                preds = apply_fn(params, x, tables)
                if tcfg.loss == "l1":
                    return jnp.mean(jnp.abs(preds - y)), preds
                return jnp.mean((preds - y) ** 2), preds
    else:
        mesh = None
        g = build_graph(s2, r2, n)
        if use_diag:
            # Diagonal-window superblock kernel (v6) over the KD-patch
            # ordering: narrow streamed windows (S bytes/flops ∝ window)
            # with the ~2% out-of-window edges placed in-kernel. Fastest
            # measured at every level: L7 agg 1.17 ms vs 1.71 sliding,
            # L8 5.96 vs 9.4, L9 24.8 vs 59.6 packed. S built on device.
            from gwen_tpu.graph import to_diag_window

            graph = to_diag_window(
                g, window_size=config.mesh.diag_window,
                dtype=compute_dtype, device_build=True,
                packed=(kernel == "diag_packed"),
                transpose_tables=(processor == "attention"),
            )
        elif (jax.default_backend() == "tpu" and kernel != "segment"
              and processor != "interaction"):
            # Sliding-ring streamed-S kernel (x read once, one S stream
            # shared across folded batch members); S built on device so
            # only O(edges) bytes cross the host->device link. Where the
            # weighted S would not fit HBM (L9+), the bit-packed rank-1
            # variant (1/16 the bytes) keeps the MXU path.
            from gwen_tpu.graph import bandwidth as graph_bandwidth
            from gwen_tpu.graph import to_sliding_packed

            bw = graph_bandwidth(s2, r2)
            s_bytes = (-(-n // 128) * 128) * (-(-bw // 128) * 128 + 128) * 2
            if kernel == "packed" or (
                kernel != "sliding" and s_bytes >= int(7 * 2**30)
            ):
                graph = to_sliding_packed(g, device_build=True)
            else:
                graph = to_sliding_dense(
                    g, dtype=compute_dtype, device_build=True
                )
        else:
            graph = g
        context = graph
        if tcfg.rollout_horizon > 1:
            from gwen_tpu.train.tasks import rollout_loss_fn

            loss_fn = rollout_loss_fn(model, tcfg.rollout_horizon)
        elif tcfg.loss == "crps-ensemble":
            from gwen_tpu.train.tasks import ensemble_crps_loss_fn

            loss_fn = ensemble_crps_loss_fn(
                model, num_members=tcfg.crps_members, sigma=tcfg.sigma
            )
        else:
            loss_fn = mesh_graph_loss_fn(
                model, loss=tcfg.loss if tcfg.loss in ("mse", "l1") else "mse"
            )
        global_graph = g

    # Train on all members except the last (held out for skill verification).
    train_fields = fields.map(lambda s: s[:-1]) if lazy else fields[:, :-1]
    ds = MeshEnsembleDataset(fields=train_fields)
    params = model.init(jax.random.key(tcfg.seed))
    from gwen_tpu.train.optim import make_optimizer

    opt = make_optimizer(
        tcfg.lr * tcfg.lr_multiplier,
        weight_decay=tcfg.weight_decay,
        scheduler=tcfg.scheduler,
        warmup_steps=tcfg.warmup_steps,
        cycle_steps=tcfg.cycle_steps,
        grad_clip=tcfg.grad_clip,
    )
    state = TrainState.create(params, opt)

    registry = Registry(config.run.registry_root)
    experiment = (config.run.experiment or default_experiment()) + "_MESH"
    run = registry.create_run(experiment, config.to_dict(), config.run.run_name)
    ckpt = Checkpointer(
        Path(config.run.registry_root) / "checkpoints" / run.run_id,
        max_to_keep=tcfg.max_checkpoints,
    )
    batch_spec = None
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        def batch_spec(batch):
            # Node fields: batch over "data", node axis (-2) over "graph".
            # Scalars / PRNG keys replicate.
            def sp(leaf):
                nd = getattr(leaf, "ndim", 0)
                if nd == 0:
                    return P()
                spec = [None] * nd
                spec[0] = "data"
                if nd >= 3:
                    spec[-2] = "graph"
                return P(*spec)

            return jax.tree_util.tree_map(sp, batch)

    trainer = Trainer(
        loss_fn=loss_fn, optimizer=opt, mesh=mesh, context=context,
        run=run, checkpointer=ckpt, log_every=tcfg.log_every,
        batch_spec=batch_spec,
    )

    if tcfg.rollout_horizon > 1:
        batches = lambda ep: ds.trajectory_batches(  # noqa: E731
            tcfg.batch_size, tcfg.rollout_horizon, shuffle=True, seed=ep
        )
    elif tcfg.loss == "crps-ensemble":
        def batches(ep):
            for i, (x, y) in enumerate(ds.batches(tcfg.batch_size, shuffle=True, seed=ep)):
                yield (x, y, jax.random.key(ep * 100003 + i))
    else:
        batches = lambda ep: ds.batches(tcfg.batch_size, shuffle=True, seed=ep)  # noqa: E731
    state, best = trainer.fit(
        state, batches, tcfg.epochs, checkpoint_every=tcfg.checkpoint_every
    )
    # Persist EVERY hyperparameter the export CLI needs to rebuild the
    # model: a mismatched processor/attn_heads/residual/mlp_layers produces
    # identical param shapes, so export would otherwise succeed and serve
    # silently wrong predictions. nodes/data pin the mesh identity.
    run.save_model(
        state.params,
        {"latent_size": config.model.latent_size,
         "process_steps": config.model.process_steps,
         "channels": ch, "levels": levels,
         "processor": processor,
         "attn_heads": config.model.attn_heads,
         "attn_pack": config.model.attn_pack,
         "residual": config.model.residual,
         "mlp_layers": config.model.mlp_layers,
         "diag_window": config.mesh.diag_window,
         "compute_dtype": config.model.compute_dtype,
         "nodes": n, "data": data or ""},
        best_metric=best,
    )

    # Skill verification against the held-out member.
    horizon = min(4, fields.shape[0] - 1)
    base = jnp.asarray(fields[0, -1, :n] if use_partition else fields[0, -1])
    truth = jnp.asarray(fields[1 : 1 + horizon, -1, :n] if use_partition
                        else fields[1 : 1 + horizon, -1])

    skill_model = (
        EncodeProcessDecode(
            channels_in=ch, channels_out=ch,
            latent_size=config.model.latent_size,
            process_steps=config.model.process_steps,
            mlp_layers=config.model.mlp_layers,
            residual=config.model.residual,
            backend="segment" if processor != "attention" else "auto",
            processor=processor,
            attn_heads=config.model.attn_heads,
            attn_pack=_pack_mode(config.model.attn_pack),
        )
    )
    if processor == "attention":
        # Attention needs the diag layout; aggregate() dispatch makes the
        # same container serve the perturbation smoothing. On the
        # partitioned path, rebuild the equivalent GLOBAL layout for skill
        # eval (same n_pad so the window mask matches the trained model).
        if use_partition:
            from gwen_tpu.graph import to_diag_window as _tdw

            global_graph = _tdw(
                global_graph, window_size=config.mesh.diag_window,
                dtype=compute_dtype,
                device_build=jax.default_backend() == "tpu",
                n_pad=pg.num_parts * pg.n_local,
                transpose_tables=True,
            )
        else:
            global_graph = graph
    sigma = tcfg.sigma
    if tcfg.calibrate_sigma and fields.shape[1] > 1:
        cal = ensemble.calibrate_sigma(
            skill_model, state.params, global_graph,
            fields[:, :-1, :n] if use_partition else fields[:, :-1],
            jax.random.key(11), num_members=members, horizon=horizon,
        )
        sigma = cal["best_sigma"]
        run.log_metric("calibrated_sigma", sigma)
    gen = ensemble.generate_ensemble(
        skill_model, state.params, global_graph, base, jax.random.key(7),
        num_members=members, num_steps=horizon, sigma=sigma,
    )
    inflation = tcfg.inflation
    if tcfg.calibrate_inflation and fields.shape[1] > 1:
        # Closed-form: calibrate on a *validation* member (not the held-out
        # one), then apply to the held-out generation.
        vbase = jnp.asarray(fields[0, 0, :n] if use_partition else fields[0, 0])
        vtruth = jnp.asarray(fields[1 : 1 + horizon, 0, :n] if use_partition
                             else fields[1 : 1 + horizon, 0])
        vgen = ensemble.generate_ensemble(
            skill_model, state.params, global_graph, vbase, jax.random.key(13),
            num_members=members, num_steps=horizon, sigma=sigma,
        )
        inflation = ensemble.calibrate_inflation(vgen, vtruth, ensemble_axis=0)
        run.log_metric("calibrated_inflation", inflation)
    if inflation != 1.0:
        gen = ensemble.inflate_ensemble(gen, inflation, ensemble_axis=0)
    skill = ensemble.ensemble_skill(gen, truth, ensemble_axis=0)
    for k, v in skill.items():
        run.log_metric(f"skill_{k}", v)
    run.finish()
    log.info("mesh training done: best=%.5f skill=%s", best, skill)
    return {"best_train_loss": best, "run_id": run.run_id, "nodes": n,
            "edges": len(s), **{f"skill_{k}": v for k, v in skill.items()}}
