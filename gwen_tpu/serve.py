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
    and referenced by index."""
    if tree is None or isinstance(tree, (bool, int, float, str)):
        return {"k": "lit", "v": tree}
    if _is_array(tree):
        leaves.append(np.asarray(tree))
        return {"k": "arr", "i": len(leaves) - 1}
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
        return leaves[spec["i"]]
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


def _shapes_of(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
        if _is_array(a) else a,
        tree,
    )


def export_model(model, params, graph, sample_input, path,
                 metadata: "dict | None" = None) -> Path:
    """Export ``model.apply(params, graph, x)`` as a serving artifact.

    ``sample_input`` fixes the input shape/dtype (serving is static-shape —
    the TPU contract). Returns the artifact directory path.
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

    leaves: list[np.ndarray] = []
    spec = {
        "params": pack_tree(params, leaves),
        "graph": pack_tree(graph, leaves),
        "input": {"shape": list(np.shape(sample_input)),
                  "dtype": np.asarray(sample_input).dtype.name},
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "metadata": metadata or {},
    }
    np.savez(path / "arrays.npz",
             **{f"a{i}": leaf for i, leaf in enumerate(leaves)})
    (path / "meta.json").write_text(json.dumps(spec))
    return path


class ServingModel:
    """A loaded serving artifact: ``step`` one forward, ``rollout`` many.

    ``load`` needs only this module — not the model class, training config,
    or graph builders.
    """

    def __init__(self, exported, params, graph, meta: dict):
        self._exported = exported
        self.params = params
        self.graph = graph
        self.meta = meta

    @classmethod
    def load(cls, path) -> "ServingModel":
        import jax

        path = Path(path)
        exported = jax.export.deserialize(
            (path / "model.stablehlo").read_bytes())
        meta = json.loads((path / "meta.json").read_text())
        with np.load(path / "arrays.npz") as z:
            leaves = [z[f"a{i}"] for i in range(len(z.files))]
        params = unpack_tree(meta["params"], leaves)
        graph = unpack_tree(meta["graph"], leaves)
        return cls(exported, params, graph, meta)

    @property
    def input_shape(self) -> tuple:
        return tuple(self.meta["input"]["shape"])

    def step(self, x):
        """One forward step on the exported computation."""
        import jax

        p_flat = jax.tree_util.tree_leaves(self.params)
        g_flat = jax.tree_util.tree_leaves(self.graph)
        return self._exported.call(p_flat, g_flat, x)

    def rollout(self, x0, num_steps: int):
        """Autoregressive rollout: feed each prediction back as input.
        Returns the stacked trajectory (num_steps, *state_shape)."""
        import jax.numpy as jnp

        states = []
        x = x0
        for _ in range(num_steps):
            x = self.step(x)
            states.append(x)
        return jnp.stack(states)
