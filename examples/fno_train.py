"""Train a 1-D FNO on a synthetic operator-learning task.

Task: learn the mapping u0 -> solution of the periodic heat equation at time
t (u_t = nu * u_xx), whose exact solution is a per-mode spectral decay —
learnable by the FNO's frequency-domain channel mixing, and a real end-to-end
exercise of the library's rFFT/irFFT autodiff path.

Run: python examples/fno_train.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from mixed_radix_fast_fourier_transform_tpu.models import fno


def heat_solution(u0: np.ndarray, nu: float = 0.05, t: float = 1.0) -> np.ndarray:
    """Exact periodic heat-equation evolution via the spectral propagator."""
    n = u0.shape[-1]
    k = np.fft.fftfreq(n) * n
    decay = np.exp(-nu * (2 * np.pi * k / n) ** 2 * t * n)
    return np.fft.ifft(np.fft.fft(u0, axis=-1) * decay, axis=-1).real.astype(np.float32)


def make_batch(rng: np.random.Generator, batch: int, n: int):
    # smooth random initial conditions: low-pass filtered noise
    z = rng.standard_normal((batch, n)).astype(np.float32)
    spec = np.fft.rfft(z, axis=-1)
    spec[:, 12:] = 0
    u0 = np.fft.irfft(spec, n=n, axis=-1).astype(np.float32)
    return u0[:, None, :], heat_solution(u0)[:, None, :]  # (b, 1, n)


def main(steps: int = 300, n: int = 256, batch: int = 32):
    import optax

    rng = np.random.default_rng(0)
    params = fno.init_fno(jax.random.PRNGKey(0), 1, 16, 1, n_layers=2, modes=24)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(fno.loss_fn)(params, x, y)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    xe, ye = make_batch(rng, batch, n)
    for i in range(steps):
        x, y = make_batch(rng, batch, n)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x), jnp.asarray(y))
        if i % 50 == 0:
            eval_loss = fno.loss_fn(params, jnp.asarray(xe), jnp.asarray(ye))
            print(f"step {i:4d}: train {float(loss):.5f}  eval {float(eval_loss):.5f}")
    final = float(fno.loss_fn(params, jnp.asarray(xe), jnp.asarray(ye)))
    base = float(np.mean(ye ** 2))
    print(f"final eval loss: {final:.5f}  (predict-zero baseline {base:.5f})")


if __name__ == "__main__":
    main()
