"""gwen_tpu — TPU-native GNN framework for weather ensemble generation.

Built from scratch in JAX/XLA/Pallas with the capabilities of MeteoSwiss/GWEN
(see SURVEY.md): zarr ensemble ingestion, graph construction over ensemble
members and weather meshes, GCN / encode-process-decode model families with
Pallas SpMM aggregation, loss library (masked L1, CRPS, ensemble variance
regularization), multi-device training over a ``jax.sharding.Mesh`` (data
parallel over members + edge-partitioned graph parallelism with halo
exchange), checkpointing, an experiment registry, and GIF visualization.
"""

from gwen_tpu.version import __author__, __version__

from gwen_tpu.config import GwenConfig, load_config
from gwen_tpu.logging_utils import get_logger, setup_logger, suppress_warnings

__all__ = [
    "__author__",
    "__version__",
    "GwenConfig",
    "load_config",
    "get_logger",
    "setup_logger",
    "suppress_warnings",
]
