"""Two-process jax.distributed test on localhost (SURVEY.md §5.8).

Spawns two subprocesses, each with 4 virtual CPU devices, connected by a
jax.distributed coordinator; together they form one 8-device global mesh.
Both run the REAL pair-sharded LM bundle adjustment — its JtJ/Jtb psums
cross the process boundary (the DCN analog) — and must agree with this
process's single-process 8-device result.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
WORKER = os.path.join(REPO, "tools", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_ba():
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"127.0.0.1:{port}", "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    results = {}
    for out in outs:
        m = re.search(
            r"MPRESULT pid=(\d+) ndev=(\d+) sum=(\S+) focal0=(\S+)", out
        )
        assert m, out[-3000:]
        assert int(m.group(2)) == 8  # global device count spans processes
        results[int(m.group(1))] = (float(m.group(3)), float(m.group(4)))

    assert set(results) == {0, 1}
    # both processes hold the same replicated solution
    np.testing.assert_allclose(results[0], results[1], rtol=1e-12)

    # and it matches the single-process 8-virtual-device run in-process
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import mp_worker

    from openpano_tpu.parallel.mesh import make_mesh

    ref = np.asarray(mp_worker.solve(make_mesh(8)))
    np.testing.assert_allclose(results[0][0], float(ref.sum()), rtol=1e-9)
    np.testing.assert_allclose(results[0][1], float(ref[0, 0]), rtol=1e-9)
    # the solve genuinely optimized: focal pulled from the 540 init toward
    # the truth 500 (ring-only pairs constrain focal weakly, so partial
    # convergence under the >1e-3 RMS acceptance rule is expected)
    assert abs(ref[:, 0].mean() - 500.0) < 0.75 * 40.0
