"""Loss library.

Parity with the reference's ``loss_functions.py`` plus the target-node masked
L1 used by the GNN trainer, and a proper (fair) ensemble CRPS for skill
evaluation (extension; SURVEY §6).

All functions are pure, jit-safe, and operate on ``jnp`` arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_SQRT2 = 1.4142135623730951
_INV_SQRT_PI = 0.5641895835477563


def _norm_cdf(z: Array) -> Array:
    return 0.5 * (1.0 + jax.lax.erf(z / _SQRT2))


def l1_loss(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(pred - target))


def masked_node_l1(output: Array, x: Array, target_mask: Array, node_axis: int = -2) -> Array:
    """L1 over target-masked nodes only.

    Reference: free function ``loss_func`` (models_gnn.py:261-265) — the GNN
    training loss over nodes where ``target_mask`` is True. Implemented as a
    weighted mean so shapes stay static under jit. ``target_mask`` is 1-D over
    the node axis (default: second-to-last, i.e. ``(..., nodes, features)``).
    """
    mask = target_mask.astype(output.dtype)
    shape = [1] * output.ndim
    shape[node_axis] = mask.shape[0]
    mask = mask.reshape(shape)
    diff = jnp.abs(output - x) * mask
    # Each masked node contributes output.size / num_nodes elements.
    per_node = output.size // target_mask.size
    denom = jnp.maximum(jnp.sum(mask) * per_node, 1.0)
    return jnp.sum(diff) / denom


def crps_gaussian_surrogate(preds: Array, target: Array, ensemble_axis: int = 1) -> Array:
    """Reference ``CRPSLoss`` (loss_functions.py:41-73): fit a Gaussian over the
    ensemble axis and return ``mean((Phi((y-mu)/sigma) - 0.5)^2)``.

    Note: this is the reference's surrogate, not the analytic Gaussian CRPS —
    kept for parity. See :func:`crps_gaussian` and :func:`crps_ensemble` for
    proper scores.
    """
    mu = jnp.mean(preds, axis=ensemble_axis, keepdims=True)
    sigma = jnp.std(preds, axis=ensemble_axis, keepdims=True) + 1e-6
    z = (target - mu) / sigma
    return jnp.mean((_norm_cdf(z) - 0.5) ** 2)


def crps_gaussian(mu: Array, sigma: Array, target: Array) -> Array:
    """Analytic CRPS of a Gaussian forecast (Gneiting & Raftery 2007, eq. 21)."""
    sigma = jnp.maximum(sigma, 1e-8)
    z = (target - mu) / sigma
    pdf = jnp.exp(-0.5 * z * z) / jnp.sqrt(2.0 * jnp.pi)
    crps = sigma * (z * (2.0 * _norm_cdf(z) - 1.0) + 2.0 * pdf - _INV_SQRT_PI)
    return jnp.mean(crps)


def crps_ensemble(preds: Array, target: Array, ensemble_axis: int = 0, fair: bool = True) -> Array:
    """Empirical ensemble CRPS: ``E|X - y| - c * E|X - X'|`` with c = 1/2
    (standard) or m/(2(m-1)) equivalent fair correction.

    Used for skill verification of generated ensemble members against held-out
    ICON members (BASELINE.md targets). ``preds``: ensemble on
    ``ensemble_axis``; ``target``: same shape minus that axis.
    """
    preds = jnp.moveaxis(preds, ensemble_axis, 0)
    m = preds.shape[0]
    term1 = jnp.mean(jnp.abs(preds - target[None]), axis=0)
    # Pairwise spread via O(m^2); m is small (ensemble members).
    diffs = jnp.abs(preds[:, None] - preds[None, :])  # (m, m, ...)
    denom = m * (m - 1) if (fair and m > 1) else m * m
    term2 = jnp.sum(diffs, axis=(0, 1)) / jnp.maximum(denom, 1)
    return jnp.mean(term1 - 0.5 * term2)


def ensemble_variance_regularized_l1(
    preds: Array, target: Array, alpha: float = 0.1, ensemble_axis: int = 1
) -> Array:
    """Reference ``EnsembleVarRegLoss`` (loss_functions.py:76-123):
    ``L1(preds, target) - alpha * mean(var(preds, ensemble_axis))`` — rewards
    ensemble spread."""
    l1 = jnp.mean(jnp.abs(preds - target))
    spread = jnp.mean(jnp.var(preds, axis=ensemble_axis))
    return l1 - alpha * spread


def masked_loss(pred: Array, target: Array, mask: Array, base: str = "l1") -> Array:
    """Reference ``MaskedLoss`` (loss_functions.py:126-180): zero out constant
    cells and normalize by the mask sum."""
    mask = mask.astype(pred.dtype)
    mask_b = jnp.broadcast_to(mask, pred.shape)
    if base == "l1":
        err = jnp.abs(pred - target)
    elif base == "mse":
        err = (pred - target) ** 2
    else:
        raise ValueError(f"unknown base loss {base!r}")
    return jnp.sum(err * mask_b) / jnp.maximum(jnp.sum(mask_b), 1.0)


def variance_mask(data: np.ndarray | Array, threshold: float, time_axis: int = 0) -> Array:
    """Mask of cells whose variance over time exceeds ``threshold``.

    Reference: mask built from per-cell time variance ``var <= mask_threshold``
    → excluded (train_gnn.py:88-96, train_cnn.py:51-60). Returns 1.0 where the
    cell is *active* (variance above threshold)."""
    var = jnp.var(jnp.asarray(data), axis=time_axis)
    return (var > threshold).astype(jnp.float32)


def rmse(pred: Array, target: Array) -> Array:
    return jnp.sqrt(jnp.mean((pred - target) ** 2))


LOSSES = {
    "l1": l1_loss,
    "l1-masked": masked_node_l1,
    "crps": crps_gaussian_surrogate,
    "crps-gaussian": crps_gaussian,
    "crps-ensemble": crps_ensemble,
    "ensemble-var-reg": ensemble_variance_regularized_l1,
    "masked": masked_loss,
    "rmse": rmse,
}
