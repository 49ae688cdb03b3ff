"""MDCT/IMDCT: direct cosine-matrix oracle, TDAC perfect reconstruction,
window properties, error paths."""

import numpy as np
import pytest

import mixed_radix_fast_fourier_transform_tpu as sp


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _direct_mdct(frames, w):
    """Oracle: X[k] = sum_n w[n] x[n] cos[(pi/N)(n+1/2+N/2)(k+1/2)]."""
    n2 = frames.shape[-1]
    half = n2 // 2
    n = np.arange(n2)
    k = np.arange(half)
    C = np.cos(np.pi / half * (n[None, :] + 0.5 + half / 2) * (k[:, None] + 0.5))
    return (frames * w) @ C.T


@pytest.mark.parametrize("frame_length", [8, 16, 64, 256])
def test_mdct_matches_direct(rng, frame_length):
    half = frame_length // 2
    x = rng.standard_normal(half * 7).astype(np.float32)
    w = sp.mdct_window("sine", frame_length, dtype=np.float64)
    got = np.asarray(sp.mdct(x, frame_length))
    # replicate the framing (pad half both sides, hop = half)
    xp = np.concatenate([np.zeros(half), x, np.zeros(half)])
    nf = (len(xp) - frame_length) // half + 1
    frames = np.stack([xp[i * half : i * half + frame_length] for i in range(nf)])
    want = _direct_mdct(frames, w)
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


@pytest.mark.parametrize("window", ["sine", ("kbd", 4.0), None])
@pytest.mark.parametrize("norm", [None, "ortho"])
def test_tdac_perfect_reconstruction(rng, window, norm):
    n = 1000  # not a multiple of the hop: exercises tail padding
    x = rng.standard_normal(n).astype(np.float32)
    coeff = sp.mdct(x, 128, window, norm=norm)
    back = np.asarray(sp.imdct(coeff, window, norm=norm, length=n))
    assert back.shape == (n,)
    assert np.max(np.abs(back - x)) < 1e-4


def test_mdct_batched_and_jit(rng):
    import jax

    x = rng.standard_normal((3, 4, 512)).astype(np.float32)
    got = np.asarray(jax.jit(lambda a: sp.mdct(a, 64))(x))
    row = np.asarray(sp.mdct(x[1, 2], 64))
    assert got.shape[:2] == (3, 4)
    np.testing.assert_allclose(got[1, 2], row, rtol=0, atol=1e-5)
    back = np.asarray(sp.imdct(sp.mdct(x, 64), length=512))
    assert np.max(np.abs(back - x)) < 1e-4


def test_mdct_windows_princen_bradley():
    for window in ["sine", ("kbd", 6.0), None]:
        w = sp.mdct_window(window, 256, dtype=np.float64)
        pb = w[:128] ** 2 + w[128:] ** 2
        np.testing.assert_allclose(pb, 1.0, atol=1e-12)


def test_mdct_ortho_energy(rng):
    """norm='ortho' + rectangular PB window: TDAC frames preserve energy of
    the padded, windowed analysis (Parseval in the lapped sense) — check the
    round trip instead, plus coefficient scale vs the direct oracle."""
    x = rng.standard_normal(512).astype(np.float32)
    c_none = np.asarray(sp.mdct(x, 64, norm=None))
    c_ortho = np.asarray(sp.mdct(x, 64, norm="ortho"))
    np.testing.assert_allclose(
        c_ortho, c_none * np.sqrt(2.0 / 32), rtol=1e-6, atol=1e-6
    )


def test_mdct_errors(rng):
    x = rng.standard_normal(128).astype(np.float32)
    with pytest.raises(ValueError):
        sp.mdct(x, 6)  # not a multiple of 4
    with pytest.raises(ValueError):
        sp.mdct(x, 64, norm="bad")
    with pytest.raises(ValueError):
        sp.mdct(np.zeros(0, np.float32), 64)
    with pytest.raises(ValueError):
        sp.mdct(x[:100], 64, pad=False)  # 100 not a multiple of 32
    with pytest.raises(ValueError):
        sp.mdct_window("hann?", 64)
    with pytest.raises(ValueError):
        sp.mdct_window(np.ones(63), 64)
    with pytest.raises(ValueError):
        sp.imdct(np.zeros(32, np.float32))  # needs a frames axis


def test_mdct_integer_input_promoted(rng):
    """Int PCM input must not silently zero out via window truncation."""
    x = (rng.standard_normal(512) * 1000).astype(np.int32)
    c = np.asarray(sp.mdct(x, 64))
    assert np.abs(c).max() > 0
    back = np.asarray(sp.imdct(sp.mdct(x.astype(np.float32), 64), length=512))
    np.testing.assert_allclose(back, x.astype(np.float32), atol=1e-2)


def test_imdct_rejects_odd_half(rng):
    with pytest.raises(ValueError):
        sp.imdct(rng.standard_normal((5, 33)).astype(np.float32))


def test_mdct_window_rejects_bad_frame_length():
    with pytest.raises(ValueError):
        sp.mdct_window(("kbd", 4.0), 63)
    with pytest.raises(ValueError):
        sp.mdct_window("sine", 6)
