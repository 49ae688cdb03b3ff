"""Serving-side deployment of a spectral pipeline.

Exports a jitted denoise pipeline (rfft -> per-bin Wiener-style gain ->
irfft) to a serialized StableHLO artifact, then reloads and runs it as a
serving fleet would: no plan construction, no factorization, no library
code on the serving path — the stage matrices and twiddles are baked into
the artifact as constants.

Run: python examples/serving_export.py
"""

import numpy as np

import jax
import jax.numpy as jnp

import mixed_radix_fast_fourier_transform_tpu as sp
from mixed_radix_fast_fourier_transform_tpu.utils.aot import (
    aot_compile,
    export_transform,
    load_transform,
)


def denoise(x):
    """Fixed-gain spectral denoiser for (batch, 4096) fp32 frames."""
    spec = sp.rfft(x)
    k = jnp.arange(spec.shape[-1], dtype=jnp.float32)
    gain = 1.0 / (1.0 + (k / 400.0) ** 4)  # lowpass Butterworth-style
    return sp.irfft(spec * gain, n=x.shape[-1])


def main():
    rng = np.random.default_rng(0)
    batch = rng.standard_normal((8, 4096)).astype(np.float32)

    # 1. build-side: export the pipeline for the serving shape
    blob = export_transform(denoise, batch)
    print(f"exported artifact: {len(blob)} bytes (StableHLO, plans baked in)")

    # 2. serve-side: reload from bytes and run
    runner = load_transform(blob)
    out = np.asarray(runner(batch))
    ref = np.asarray(denoise(batch))
    print(f"reloaded output matches source: max err "
          f"{np.max(np.abs(out - ref)):.2e}")

    # 3. alternative: AOT-compile in-process (zero first-request latency)
    compiled = aot_compile(denoise, batch)
    t = compiled(batch)
    jax.block_until_ready(t)
    flops = compiled.cost_analysis().get("flops", float("nan"))
    print(f"AOT-compiled executable ready; compiler-reported flops: {flops:.3g}")


if __name__ == "__main__":
    main()
