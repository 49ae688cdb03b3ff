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


def test_export_shorttime_and_kalman(rng):
    """The serving path covers the round-4 subsystems: ShortTimeFFT frames
    and the parallel Kalman filter export to StableHLO and reload."""
    import jax.numpy as jnp
    import numpy as np
    import scipy.signal as ss

    from mixed_radix_fast_fourier_transform_tpu import ShortTimeFFT
    from mixed_radix_fast_fourier_transform_tpu.ops.kalman import (
        kalman_filter,
    )
    from mixed_radix_fast_fourier_transform_tpu.utils.aot import (
        export_transform, load_transform,
    )

    S = ShortTimeFFT(ss.windows.hann(32, sym=False), 9, 100.0)
    x = rng.standard_normal(150).astype(np.float32)
    blob = export_transform(lambda v: jnp.abs(S.stft(v)), x)
    fn = load_transform(blob)
    np.testing.assert_allclose(np.asarray(fn(x)),
                               np.abs(np.asarray(S.stft(x))), atol=1e-5)

    F = np.array([[1.0, 1.0], [0.0, 0.9]], np.float32)
    Q = 0.01 * np.eye(2, dtype=np.float32)
    H = np.array([[1.0, 0.0]], np.float32)
    R = np.array([[0.1]], np.float32)
    ys = rng.standard_normal((64, 1)).astype(np.float32)
    kf = lambda y: kalman_filter(F, Q, H, R, np.zeros(2, np.float32),
                                 np.eye(2, dtype=np.float32), y)[0]
    blob2 = export_transform(kf, ys)
    fn2 = load_transform(blob2)
    np.testing.assert_allclose(np.asarray(fn2(ys)), np.asarray(kf(ys)),
                               atol=1e-5)
