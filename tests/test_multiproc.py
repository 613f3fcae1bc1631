"""Opt-in multi-process dryrun test (VERDICT r1 #9).

Spawns 2 JAX processes x 4 CPU devices and validates distributed init,
per-process shard assembly, cross-process gradient sync, and
``process_allgather`` against single-process ground truth. ~20 s of fresh
interpreter + import cost per run, so it is opt-in for the fast suite
(``GWEN_MP_TEST=1 pytest tests/test_multiproc.py``) and always run by
``tools/ci.sh`` as its own step.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GWEN_MP_TEST"),
    reason="multi-process dryrun is opt-in (set GWEN_MP_TEST=1); tools/ci.sh runs it",
)

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "multiproc_dryrun.py",
)


def test_two_process_dryrun():
    out = subprocess.run(
        [sys.executable, _SCRIPT],
        capture_output=True,
        text=True,
        timeout=360,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result == {
        "dryrun": "multiprocess_cpu",
        "processes": 2,
        "local_devices": 4,
        "ok": True,
    }
