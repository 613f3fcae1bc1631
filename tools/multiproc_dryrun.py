"""Multi-process CPU dryrun: 2 JAX processes x 4 virtual devices = 8-device mesh.

Exercises the cross-process code paths that single-process tests can't reach
(SURVEY §2.4 TPU-native mapping of the reference's NCCL rendezvous,
models_gnn.py:321-324):

- ``jax.distributed.initialize`` rendezvous (gwen_tpu.train.mesh
  ``initialize_distributed``),
- per-process shard reads assembled into a global sharded array
  (``gwen_tpu.data.multihost.process_slice`` / ``global_sharded_array``),
- a jitted loss+grad step over the multi-process mesh (gradient sync =
  XLA collectives across processes — what DDP did, models_cnn.py:510),
- ``process_allgather`` of per-process predictions (replaces
  ``dist.all_gather`` + rank reorder, models_gnn.py:470-471).

Run the parent (spawns children, waits, prints one JSON line):

    python tools/multiproc_dryrun.py

Exit code 0 iff every child validated every step against single-process
numpy ground truth.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

NPROC = 2
LOCAL_DEVICES = 4


def _child(pid: int, nproc: int, port: int) -> None:
    import jax

    # This environment pre-imports jax at interpreter start (sitecustomize),
    # so configure via jax.config before any backend use (CLAUDE.md gotcha).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")

    import numpy as np

    from gwen_tpu.data import multihost
    from gwen_tpu.train.mesh import initialize_distributed, make_mesh

    initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == LOCAL_DEVICES
    assert jax.device_count() == nproc * LOCAL_DEVICES

    # --- global sharded array from per-process shard "reads" -------------
    # Ground truth: a (member=8, feat=6) ensemble array every process can
    # compute; each process contributes only its member slice, as a real
    # multi-host loader would read only its slice of the zarr archive.
    members, feat = 8, 6
    full = (
        np.arange(members * feat, dtype=np.float32).reshape(members, feat)
        * 0.25
    )
    sl = multihost.process_slice(members)
    mesh = make_mesh(data=4, graph=2)
    from jax.sharding import PartitionSpec as P

    # member axis sharded over BOTH mesh axes (4x2=8 shards of 1 member);
    # local shard covers this process's 4 devices worth.
    garr = multihost.global_sharded_array(full[sl], mesh, P(("data", "graph")))
    assert garr.shape == (members, feat)

    # --- jitted loss + grad over the multi-process mesh ------------------
    w = jax.device_put(
        np.full((feat,), 0.5, np.float32),
        jax.sharding.NamedSharding(mesh, P()),
    )

    @jax.jit
    def loss_and_grad(w, x):
        def loss(w):
            return jnp_mean_sq(w, x)

        return jax.value_and_grad(loss)(w)

    def jnp_mean_sq(w, x):
        import jax.numpy as jnp

        return jnp.mean((x @ w) ** 2)

    lval, grad = loss_and_grad(w, garr)
    # ground truth on host
    want = float(np.mean((full @ np.full(feat, 0.5)) ** 2))
    np.testing.assert_allclose(float(lval), want, rtol=1e-5)
    eps = np.zeros(feat)
    gt_grad = np.empty(feat)
    for i in range(feat):
        eps[:] = 0
        eps[i] = 1e-3
        up = np.mean((full @ (np.full(feat, 0.5) + eps)) ** 2)
        dn = np.mean((full @ (np.full(feat, 0.5) - eps)) ** 2)
        gt_grad[i] = (up - dn) / 2e-3
    np.testing.assert_allclose(np.asarray(grad), gt_grad, rtol=1e-3)

    # --- cross-process allgather of per-process predictions --------------
    local_pred = np.full((3,), float(pid), np.float32)
    gathered = multihost.all_gather_from_hosts(local_pred)
    want_g = np.stack([np.full((3,), float(i), np.float32) for i in range(nproc)])
    np.testing.assert_allclose(gathered, want_g)

    print(f"[child {pid}] ok: loss={float(lval):.6f} gather={gathered.ravel().tolist()}")
    jax.distributed.shutdown()


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main() -> int:
    role = os.environ.get("GWEN_MP_ROLE")
    if role == "child":
        _child(
            int(os.environ["GWEN_MP_PID"]),
            int(os.environ["GWEN_MP_NPROC"]),
            int(os.environ["GWEN_MP_PORT"]),
        )
        return 0

    # _free_port closes its probe socket before the coordinator child binds
    # the port — a TOCTOU window where another process can grab it. Retry
    # the whole spawn with a fresh port when the failure looks like a
    # bind/rendezvous race (not a genuine test failure).
    _RACE_MARKERS = (
        "Address already in use",
        "address already in use",
        "Failed to connect",
        "UNAVAILABLE",
        "DEADLINE_EXCEEDED",
        "Connection refused",
        "bind",
    )
    for attempt in range(3):
        port = _free_port()
        procs = []
        for pid in range(NPROC):
            env = dict(os.environ)
            env.update(
                GWEN_MP_ROLE="child",
                GWEN_MP_PID=str(pid),
                GWEN_MP_NPROC=str(NPROC),
                GWEN_MP_PORT=str(port),
                # Belt and braces: also steer platform selection at
                # interpreter start for the fresh child processes.
                JAX_PLATFORMS="cpu",
            )
            procs.append(
                subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        ok = True
        logs = []
        for pid, p in enumerate(procs):
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
                ok = False
            logs.append(out)
            if p.returncode != 0:
                ok = False
        if ok:
            break
        race = any(m in log for log in logs for m in _RACE_MARKERS)
        if race and attempt < 2:
            sys.stderr.write(
                f"--- attempt {attempt} hit a port/rendezvous race on port "
                f"{port}; retrying with a fresh port ---\n"
            )
            continue
        for pid, (p, out) in enumerate(zip(procs, logs)):
            if p.returncode != 0:
                sys.stderr.write(f"--- child {pid} (rc={p.returncode}) ---\n{out}\n")
        break
    print(
        json.dumps(
            {
                "dryrun": "multiprocess_cpu",
                "processes": NPROC,
                "local_devices": LOCAL_DEVICES,
                "ok": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
