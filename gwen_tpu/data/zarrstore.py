"""Zarr ensemble archive on tensorstore.

Replaces the reference's xarray/zarr/numcodecs stack (create_zarr_archive.py,
preprocess_data.py) with tensorstore's zarr driver: chunked, zlib-compressed
arrays on disk, resizable along the member axis for append-style ingestion
(reference: ``to_zarr(mode="a", append_dim="member")``,
create_zarr_archive.py:28-42). Dimension names and scaling metadata live in a
sidecar ``.gwen_meta.json`` next to the array.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Sequence

import numpy as np

try:
    import tensorstore as ts

    HAVE_TENSORSTORE = True
except ImportError:  # pragma: no cover
    HAVE_TENSORSTORE = False

META_FILE = ".gwen_meta.json"


def _require_ts() -> None:
    if not HAVE_TENSORSTORE:
        raise RuntimeError("tensorstore is required for zarr I/O but is not installed")


def _zarr_dtype(dtype: np.dtype) -> str:
    return np.dtype(dtype).newbyteorder("<").str


@dataclass
class ZarrArray:
    """A chunked on-disk array with named dimensions."""

    store: "ts.TensorStore"
    path: Path
    dims: tuple[str, ...]
    meta: dict = field(default_factory=dict)

    # ------------------------------------------------------------ properties
    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self.store.shape)

    @property
    def dtype(self) -> np.dtype:
        return np.dtype(self.store.dtype.numpy_dtype)

    def axis(self, dim: str) -> int:
        return self.dims.index(dim)

    # ------------------------------------------------------------------- io
    def __getitem__(self, idx) -> np.ndarray:
        return np.asarray(self.store[idx].read().result())

    def read(self) -> np.ndarray:
        return np.asarray(self.store.read().result())

    def write(self, idx, values: np.ndarray) -> None:
        self.store[idx] = np.asarray(values, dtype=self.dtype)

    def append(self, values: np.ndarray, dim: str = "member") -> None:
        """Resize along ``dim`` and write ``values`` at the end (reference's
        append_or_create_zarr behavior)."""
        ax = self.axis(dim)
        values = np.asarray(values, dtype=self.dtype)
        if values.ndim == len(self.dims) - 1:
            values = np.expand_dims(values, ax)
        old = self.shape[ax]
        new_shape = list(self.shape)
        new_shape[ax] = old + values.shape[ax]
        self.store = self.store.resize(
            exclusive_max=new_shape, expand_only=True
        ).result()
        idx = [slice(None)] * len(self.dims)
        idx[ax] = slice(old, new_shape[ax])
        self.store[tuple(idx)] = values

    def save_meta(self) -> None:
        (self.path / META_FILE).write_text(
            json.dumps({"dims": list(self.dims), **self.meta}, indent=2)
        )


def create(
    path: str | Path,
    shape: Sequence[int],
    dims: Sequence[str],
    dtype=np.float32,
    chunks: Sequence[int] | None = None,
    compression_level: int = 1,
    meta: dict | None = None,
    delete_existing: bool = True,
) -> ZarrArray:
    """Create a zarr array (zlib-compressed, reference default level 1)."""
    _require_ts()
    path = Path(path)
    if chunks is None:
        chunks = list(shape)
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": str(path)},
        "metadata": {
            "shape": list(shape),
            "chunks": [max(1, int(c)) for c in chunks],
            "dtype": _zarr_dtype(dtype),
            "compressor": (
                {"id": "zlib", "level": int(compression_level)}
                if compression_level > 0
                else None
            ),
            "fill_value": 0,
        },
        "create": True,
        "delete_existing": delete_existing,
    }
    store = ts.open(spec).result()
    arr = ZarrArray(store=store, path=path, dims=tuple(dims), meta=dict(meta or {}))
    arr.save_meta()
    return arr


def open_array(path: str | Path) -> ZarrArray:
    _require_ts()
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"zarr store not found: {path}")
    spec = {"driver": "zarr", "kvstore": {"driver": "file", "path": str(path)}}
    store = ts.open(spec, open=True).result()
    meta_path = path / META_FILE
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    dims = tuple(meta.pop("dims", [f"dim_{i}" for i in range(store.ndim)]))
    return ZarrArray(store=store, path=path, dims=dims, meta=meta)


def exists(path: str | Path) -> bool:
    return (Path(path) / ".zarray").exists()
