"""Logging, profiling, and version surface tests."""


import jax.numpy as jnp
import numpy as np

import gwen_tpu
from gwen_tpu import profiling
from gwen_tpu.logging_utils import get_logger, setup_logger, suppress_warnings


def test_version_metadata():
    assert gwen_tpu.__version__
    assert gwen_tpu.__author__


def test_setup_logger_singleton(tmp_path):
    log1 = setup_logger(tmp_path / "log.txt", force=True)
    log2 = setup_logger(tmp_path / "other.txt")  # no force → same handlers
    assert log1 is log2
    assert log1.handlers  # process 0 gets handlers (loggers_configs.py:35-38)
    log1.info("hello")
    assert (tmp_path / "log.txt").exists()
    assert get_logger() is log1


def test_suppress_warnings_runs():
    suppress_warnings()  # must not raise


def test_profiling_timeit_and_steptimer():
    res = profiling.timeit(lambda x: x * 2, jnp.ones((8, 8)), iters=3)
    assert res["mean_s"] > 0

    timer = profiling.StepTimer(window=4, edges_per_step=100)
    for _ in range(3):
        with timer:
            _ = np.ones(10).sum()
    stats = timer.stats()
    assert stats["steps_per_s"] > 0
    assert stats["edges_per_s"] > 0


def test_device_memory_stats():
    stats = profiling.device_memory_stats()
    assert isinstance(stats, list) and stats
    assert "device" in stats[0]
