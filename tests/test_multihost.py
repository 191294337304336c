"""Multi-host bring-up: 2 jax.distributed processes, one global mesh.

Launches tests/multihost_driver.py twice (2 processes x 4 virtual CPU
devices); the driver runs the public API over the 8-device global mesh and
checks the sharded ciphertexts bit-exactly against host pow().
"""

import os
import socket
import subprocess
import sys

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_public_api():
    port = _free_port()
    driver = os.path.join(os.path.dirname(__file__), "multihost_driver.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # the driver sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, driver, str(i), "2", str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"MULTIHOST_OK pid={i}" in out, out
