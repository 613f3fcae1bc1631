"""Optimizer/schedule factory.

Reference parity+: the reference configures Adam with lr multipliers
(train_gnn.py:111 ×10, train_cnn.py:82 ×100) and ships a CyclicLR scheduler
that is disabled with "BUG: not working with DDP" (train_gnn.py:112-119).
Schedules here are pure functions of the step, so they compose with any
sharding — nothing to break.
"""

from __future__ import annotations

import optax


def make_schedule(
    lr: float,
    scheduler: str = "none",
    total_steps: int = 10_000,
    warmup_steps: int = 0,
    cycle_steps: int = 2_000,
    min_lr_factor: float = 0.1,
):
    if scheduler == "none":
        sched = lr
    elif scheduler == "cosine":
        sched = optax.cosine_decay_schedule(
            lr, max(total_steps - warmup_steps, 1), alpha=min_lr_factor
        )
    elif scheduler == "cyclic":
        # Triangular cyclic LR (the reference's broken CyclicLR, working):
        # oscillates between min_lr_factor*lr and lr with period cycle_steps.
        import jax.numpy as jnp

        def sched(step):
            phase = jnp.abs(
                (step % cycle_steps) / (cycle_steps / 2.0) - 1.0
            )  # 1 → 0 → 1 over a cycle
            return lr * (min_lr_factor + (1 - min_lr_factor) * (1.0 - phase))

    else:
        raise ValueError(f"unknown scheduler {scheduler!r}")
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, lr, warmup_steps)
        base = sched if callable(sched) else (lambda s: lr)
        sched = optax.join_schedules([warm, base], [warmup_steps])
    return sched


def make_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    scheduler: str = "none",
    total_steps: int = 10_000,
    warmup_steps: int = 0,
    cycle_steps: int = 2_000,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    sched = make_schedule(lr, scheduler, total_steps, warmup_steps, cycle_steps)
    opt = (
        optax.adamw(sched, weight_decay=weight_decay)
        if weight_decay > 0
        else optax.adam(sched)
    )
    if grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt
