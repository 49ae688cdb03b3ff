"""AOT compilation + serialized export of spectral pipelines."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp
from mixed_radix_fast_fourier_transform_tpu.utils.aot import (
    aot_compile, export_transform, load_transform,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _pipeline(x):
    import jax.numpy as jnp

    spec = sp.rfft(x)
    gained = spec * jnp.exp(-jnp.arange(spec.shape[-1]) / 64.0)
    return sp.irfft(gained, n=x.shape[-1])


def test_aot_compile_runs(rng):
    x = rng.standard_normal((4, 360)).astype(np.float32)
    compiled = aot_compile(_pipeline, x)
    got = np.asarray(compiled(x))
    want = np.asarray(_pipeline(x))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # the compiler's cost view is exposed (plans are baked-in constants)
    assert compiled.cost_analysis() is not None


def test_export_roundtrip(rng):
    """Serialize -> fresh deserialize -> same numbers (the serving unit)."""
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    blob = export_transform(_pipeline, x)
    assert isinstance(blob, bytes) and len(blob) > 0
    loaded = load_transform(blob)
    got = np.asarray(loaded(x))
    want = np.asarray(_pipeline(x))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_sfno_forward(rng):
    """A model forward (SFNO layer stack) exports and reloads."""
    import jax

    from mixed_radix_fast_fourier_transform_tpu.models import sfno

    L = 8
    params = sfno.init_sfno(jax.random.PRNGKey(0), in_channels=2,
                            hidden=4, out_channels=1, lmax=L - 1,
                            n_layers=1)
    x = rng.standard_normal((1, 2, L, 2 * L)).astype(np.float32)
    fwd = lambda v: sfno.apply(params, v)
    blob = export_transform(fwd, x)
    got = np.asarray(load_transform(blob)(x))
    want = np.asarray(fwd(x))
    np.testing.assert_allclose(got, want, atol=1e-5)
