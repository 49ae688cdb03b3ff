"""Multi-host smoke test: two local processes join via jax.distributed
(loopback coordinator), build a global mesh over both hosts' CPU devices, and
run the distributed four-step FFT with cross-process collectives.

This is the DCN story of SURVEY.md §5's "distributed communication backend"
row, exercised for real — each pytest run spawns fresh worker processes, so
the main test process never initializes jax.distributed itself.
"""

import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from mixed_radix_fast_fourier_transform_tpu.parallel import (
        fft_four_step, initialize_multihost, make_mesh)

    pid = int(sys.argv[1]); port = sys.argv[2]
    idx, cnt = initialize_multihost(f"localhost:{{port}}", 2, pid)
    assert cnt == 2
    mesh = make_mesh((1, len(jax.devices())))   # 4 devices across 2 processes
    x = np.random.default_rng(0).standard_normal(1024).astype(np.float32)
    y = fft_four_step(x, mesh)
    total = float(np.asarray(jnp.sum(jnp.abs(y))))
    want = float(np.sum(np.abs(np.fft.fft(x))))
    assert abs(total - want) / want < 1e-4, (total, want)
    print(f"proc {{idx}} OK", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_four_step(tmp_path):
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    port = str(_free_port())
    code = WORKER.format(repo=repo)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outputs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert "OK" in out
