"""Model export / serving: self-contained AOT artifacts via ``jax.export``.

The reference's only model persistence is MLflow artifact logging reloaded
in-process by the training stack (models_cnn.py:553-559, utils.py:412-442).
A production serving deployment wants a *self-contained* artifact: the
compiled computation plus its weights and graph tables, loadable without the
model code or the training configuration.

An exported artifact directory holds:

* ``model.stablehlo`` — the jitted forward step serialized with
  :func:`jax.export.export` (params, graph tables and the input state are
  *arguments* of the exported computation, so weights can be hot-swapped);
* ``arrays.npz`` — every array leaf of the params and graph pytrees;
* ``meta.json`` — pytree structure specs (a small JSON codec that round-
  trips dicts/lists/tuples and the flax-struct graph containers), the
  export platform, and caller metadata.

:class:`ServingModel` loads the directory and serves ``step``/``rollout``.
Pallas kernels export on TPU (Mosaic lowers to a serialized custom call);
CPU artifacts use the segment/XLA path.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import numpy as np

# Graph containers the codec can reconstruct (flax struct dataclasses).
_STRUCT_REGISTRY: dict[str, Any] = {}


def _registry() -> dict[str, Any]:
    if not _STRUCT_REGISTRY:
        from gwen_tpu.graph import graph as gmod

        for name in (
            "Graph", "DenseGraph", "BlockEllGraph", "BlockTileGraph",
            "WindowedDenseGraph", "SlidingDenseGraph", "SlidingRank1Graph",
            "SlidingPackedGraph", "DiagWindowGraph", "EscapeFixup",
            "MultiLevelGraph",
        ):
            _STRUCT_REGISTRY[name] = getattr(gmod, name)
    return _STRUCT_REGISTRY


def _is_array(x) -> bool:
    import jax

    return isinstance(x, (np.ndarray, jax.Array))


def pack_tree(tree, leaves: list) -> Any:
    """Encode a pytree (dicts/lists/tuples/None/scalars/arrays/graph
    structs) as a JSON-able spec; array leaves are appended to ``leaves``
    and referenced by index.  Each array entry records its dtype name:
    ``np.savez`` silently degrades ml_dtypes extension dtypes (bfloat16,
    fp8) to raw void ``|V2`` on reload, so :func:`unpack_tree` views the
    stored bit pattern back through the recorded dtype."""
    if tree is None or isinstance(tree, (bool, int, float, str)):
        return {"k": "lit", "v": tree}
    if _is_array(tree):
        leaf = np.asarray(tree)
        leaves.append(leaf)
        return {"k": "arr", "i": len(leaves) - 1, "dt": leaf.dtype.name}
    if isinstance(tree, dict):
        return {"k": "dict",
                "v": {str(key): pack_tree(val, leaves)
                      for key, val in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {"k": "list" if isinstance(tree, list) else "tuple",
                "v": [pack_tree(v, leaves) for v in tree]}
    cls = type(tree)
    if dataclasses.is_dataclass(tree) and cls.__name__ in _registry():
        return {"k": "struct", "c": cls.__name__,
                "v": {f.name: pack_tree(getattr(tree, f.name), leaves)
                      for f in dataclasses.fields(tree)}}
    raise TypeError(f"pack_tree: unsupported node type {cls.__name__}")


def unpack_tree(spec: Any, leaves: list) -> Any:
    """Inverse of :func:`pack_tree`."""
    kind = spec["k"]
    if kind == "lit":
        return spec["v"]
    if kind == "arr":
        leaf = leaves[spec["i"]]
        want = spec.get("dt")
        if want is not None and leaf.dtype.name != want:
            import ml_dtypes  # noqa: F401  (registers bfloat16 et al.)

            leaf = np.ascontiguousarray(leaf).view(np.dtype(want))
        return leaf
    if kind == "dict":
        return {key: unpack_tree(val, leaves) for key, val in spec["v"].items()}
    if kind == "list":
        return [unpack_tree(v, leaves) for v in spec["v"]]
    if kind == "tuple":
        return tuple(unpack_tree(v, leaves) for v in spec["v"])
    if kind == "struct":
        cls = _registry()[spec["c"]]
        return cls(**{key: unpack_tree(val, leaves)
                      for key, val in spec["v"].items()})
    raise ValueError(f"unpack_tree: unknown node kind {kind!r}")


# Storage views for numpy extension dtypes (ml_dtypes bfloat16/fp8): savez
# round-trips them as raw void, so store the bit pattern as an unsigned int
# of the same width; unpack_tree views it back via the spec's dtype name.
_BIT_VIEW = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def _np_storable(leaf: np.ndarray) -> np.ndarray:
    if leaf.dtype.kind == "V":  # extension dtype (not a builtin numpy one)
        return np.ascontiguousarray(leaf).view(_BIT_VIEW[leaf.dtype.itemsize])
    return leaf


def _shapes_of(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
        if _is_array(a) else a,
        tree,
    )


def export_model(model, params, graph, sample_input, path,
                 metadata: "dict | None" = None,
                 rollout_steps: int = 0) -> Path:
    """Export ``model.apply(params, graph, x)`` as a serving artifact.

    ``sample_input`` fixes the input shape/dtype (serving is static-shape —
    the TPU contract). With ``rollout_steps > 0`` a ``lax.scan``-based
    autoregressive rollout of that many steps is exported alongside the
    single step (``rollout.stablehlo``): one dispatch produces the whole
    stacked trajectory on device, instead of a host loop paying per-step
    dispatch latency and state round-trips. Returns the artifact directory.
    """
    import jax

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    # Export over FLAT leaf lists: jax.export cannot serialize treedefs
    # containing custom pytree nodes (the flax-struct graph containers), so
    # the structure is closed over at trace time and rebuilt at load time
    # from meta.json by the same codec.
    p_leaves, p_def = jax.tree_util.tree_flatten(params)
    g_leaves, g_def = jax.tree_util.tree_flatten(graph)

    def step(p_flat, g_flat, x):
        p = jax.tree_util.tree_unflatten(p_def, p_flat)
        g = jax.tree_util.tree_unflatten(g_def, g_flat)
        return model.apply(p, g, x)

    x_spec = jax.ShapeDtypeStruct(np.shape(sample_input),
                                  np.asarray(sample_input).dtype)
    exported = jax.export.export(jax.jit(step))(
        _shapes_of(p_leaves), _shapes_of(g_leaves), x_spec)
    (path / "model.stablehlo").write_bytes(exported.serialize())

    if rollout_steps > 0:
        def rollout(p_flat, g_flat, x):
            def body(carry, _):
                y = step(p_flat, g_flat, carry)
                return y, y

            _, ys = jax.lax.scan(body, x, None, length=rollout_steps)
            return ys

        exp_roll = jax.export.export(jax.jit(rollout))(
            _shapes_of(p_leaves), _shapes_of(g_leaves), x_spec)
        (path / "rollout.stablehlo").write_bytes(exp_roll.serialize())

    leaves: list[np.ndarray] = []
    spec = {
        "params": pack_tree(params, leaves),
        "graph": pack_tree(graph, leaves),
        "input": {"shape": list(np.shape(sample_input)),
                  "dtype": np.asarray(sample_input).dtype.name},
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "rollout_steps": int(rollout_steps),
        "metadata": metadata or {},
    }
    np.savez(path / "arrays.npz",
             **{f"a{i}": _np_storable(leaf) for i, leaf in enumerate(leaves)})
    (path / "meta.json").write_text(json.dumps(spec))
    return path


class ServingModel:
    """A loaded serving artifact: ``step`` one forward, ``rollout`` many.

    ``load`` needs only this module — not the model class, training config,
    or graph builders.
    """

    def __init__(self, exported, params, graph, meta: dict,
                 exported_rollout=None):
        self._exported = exported
        self._exported_rollout = exported_rollout
        self.params = params
        self.graph = graph
        self.meta = meta

    @classmethod
    def load(cls, path) -> "ServingModel":
        import jax

        path = Path(path)
        exported = jax.export.deserialize(
            (path / "model.stablehlo").read_bytes())
        roll = None
        if (path / "rollout.stablehlo").exists():
            roll = jax.export.deserialize(
                (path / "rollout.stablehlo").read_bytes())
        meta = json.loads((path / "meta.json").read_text())
        with np.load(path / "arrays.npz") as z:
            leaves = [z[f"a{i}"] for i in range(len(z.files))]
        params = unpack_tree(meta["params"], leaves)
        graph = unpack_tree(meta["graph"], leaves)
        return cls(exported, params, graph, meta, exported_rollout=roll)

    @property
    def input_shape(self) -> tuple:
        return tuple(self.meta["input"]["shape"])

    def step(self, x):
        """One forward step on the exported computation."""
        import jax

        p_flat = jax.tree_util.tree_leaves(self.params)
        g_flat = jax.tree_util.tree_leaves(self.graph)
        return self._exported.call(p_flat, g_flat, x)

    @property
    def rollout_steps(self) -> int:
        return int(self.meta.get("rollout_steps", 0))

    def rollout(self, x0, num_steps: int):
        """Autoregressive rollout: feed each prediction back as input.
        Returns the stacked trajectory (num_steps, *state_shape).

        When the artifact carries a scan-based rollout export (R steps per
        dispatch), the trajectory is produced in ⌈num_steps/R⌉ dispatches
        with states staying on device — not a host loop paying per-step
        dispatch latency and state round-trips."""
        import jax
        import jax.numpy as jnp

        r = self.rollout_steps
        if self._exported_rollout is not None and r > 0:
            p_flat = jax.tree_util.tree_leaves(self.params)
            g_flat = jax.tree_util.tree_leaves(self.graph)
            chunks = []
            x = x0
            for _ in range((num_steps + r - 1) // r):
                ys = self._exported_rollout.call(p_flat, g_flat, x)
                chunks.append(ys)
                x = ys[-1]
            return jnp.concatenate(chunks, axis=0)[:num_steps]

        states = []
        x = x0
        for _ in range(num_steps):
            x = self.step(x)
            states.append(x)
        return jnp.stack(states)
