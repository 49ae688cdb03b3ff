"""fp64 path: with jax_enable_x64 the engine reaches reference (C double)
precision — the dtype knob is SpectralConfig(dtype=float64).

x64 is a process-global JAX flag, so this runs in a subprocess (the
test_multihost pattern); marked slow (separate interpreter + compiles).
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, {repo!r})
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    import mixed_radix_fast_fourier_transform_tpu as sp

    cfg = dataclasses.replace(sp.DEFAULT_CONFIG, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    # complex engine at reference precision across the algorithm classes
    for n in (360, 1024, 1009):
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex128
        )
        got = np.asarray(sp.fft(x, config=cfg))
        want = np.fft.fft(x)
        rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
        assert rel < 1e-12, (n, rel)
    # real transform round trip
    xr = rng.standard_normal(4096)
    back = np.asarray(sp.irfft(sp.rfft(xr, config=cfg), n=4096, config=cfg))
    assert np.max(np.abs(back - xr)) < 1e-12
    # DCT at double precision
    xd = rng.standard_normal(256)
    import scipy.fft as sfft
    got = np.asarray(sp.dct(xd, type=2, config=cfg))
    assert np.max(np.abs(got - sfft.dct(xd, type=2))) < 1e-10
    print("fp64 OK", flush=True)
    """
).format(repo=REPO)


@pytest.mark.slow
def test_fp64_reference_precision():
    out = subprocess.run(
        [sys.executable, "-c", WORKER],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "fp64 OK" in out.stdout
