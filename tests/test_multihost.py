"""Real multi-process exercise of parallel/multihost.py (VERDICT.md item 4).

Spawns a 2-process CPU 'cluster' (jax.distributed with a local coordinator,
4 virtual devices per process = 8 global devices) in subprocesses and runs a
sharded FIR whose time-block halo exchange crosses the process boundary,
asserting bitwise parity with the single-device result. This is the
"multi-node without a real cluster" strategy from SURVEY.md §4 — the halo
ppermute between block 3 (process 0) and block 4 (process 1) travels over
the distributed backend, not device-local memory.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env():
    env = dict(os.environ)
    # Workers manage their own platform/device-count flags; scrub the
    # parent test session's.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_two_process_sharded_fir_bitwise():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            env=_worker_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, f"worker {i} output:\n{out}"


def test_initialize_noop_single_process():
    # The no-arg path must be a clean no-op outside any cluster environment.
    code = (
        "import os; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=4';"
        "os.environ.setdefault('JAX_PLATFORMS','cpu');"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from nx_signal_tpu.parallel import multihost;"
        "multihost.initialize();"
        "assert jax.process_count() == 1;"
        "assert jax.local_device_count() == 4;"
        "m = multihost.make_pod_mesh(n_channel=2);"
        "assert m.devices.shape == (2, 2);"
        "lo, hi = multihost.process_block_range(1000, m);"
        "assert (lo, hi) == (0, 1000), (lo, hi);"
        "print('NOOP_OK')"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], env=_worker_env(),
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "NOOP_OK" in res.stdout
