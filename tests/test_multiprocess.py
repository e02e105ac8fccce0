"""Real 2-process multi-host test: spawns two jax processes that bootstrap
jax.distributed over a local coordinator, form the (data=2, model=4) pod
mesh (data axis = the cross-host/DCN analog), feed host-local batch lanes,
and check the TP+DP-sharded engine's prefill/decode against a single-device
reference.  See tests/mp_worker.py for what runs inside each process.

Everything else in the suite simulates multi-chip with ONE process and 8
virtual devices; this is the only test where jax.process_count() == 2 and
collectives actually cross process boundaries.
"""

import os
import socket
import subprocess
import sys
import time


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_and_reap(worker: str, env, port: int, deadline_s: float):
    """Start both workers and wait on ONE shared deadline: if either dies
    early the other is killed immediately instead of burning a full
    per-process communicate() timeout."""
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    deadline = time.monotonic() + deadline_s
    try:
        while time.monotonic() < deadline:
            codes = [p.poll() for p in procs]
            if all(c is not None for c in codes):
                break
            # one worker failed -> its peer will hang in the coordinator
            # handshake or a collective; kill it now
            if any(c not in (None, 0) for c in codes):
                time.sleep(2)  # grace for the peer to exit on its own
                break
            time.sleep(0.5)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = [p.communicate()[0] for p in procs]
    return procs, outs


def _run_two_workers(worker_file: str, ok_tag: str) -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", worker_file)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # fresh processes must not inherit the parent's multihost identity
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)

    # _free_port is best-effort (the port is released before the workers
    # bind it); retry once on a coordinator bind collision
    for attempt in range(2):
        procs, outs = _launch_and_reap(worker, env, _free_port(), 540)
        bind_race = any(
            p.returncode != 0 and "Failed to bind" in out
            for p, out in zip(procs, outs)
        )
        if not bind_race or attempt == 1:
            break

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"{ok_tag} {i}" in out, f"worker {i} did not report success:\n{out}"


def test_two_process_pod_mesh_engine():
    _run_two_workers("mp_worker.py", "MP_OK")


def test_two_process_continuous_batching():
    _run_two_workers("mp_serving_worker.py", "MP_SERVING_OK")
