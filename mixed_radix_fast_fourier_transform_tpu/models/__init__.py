"""Model zoo: end-to-end spectral pipelines built on the engine.

The reference ships only a disabled demo harness (src/real.c:269-482); here
the demo pattern is promoted to a trainable flagship model (spectral filter)
plus the signal/metric utilities the demo used.
"""

from . import afno, audio_frontend, fnet, fno, koopman, s4d, sfno
from .koopman import (init_koopman, koopman_encode, koopman_decode,
                      koopman_rollout, koopman_loss, koopman_spectrum)
from .checkpoint import load_checkpoint, save_checkpoint
from .spectral_filter import (
    apply,
    apply_distributed,
    init_params,
    init_params_complex,
    loss_fn,
    train_step,
    train_step_distributed,
)

__all__ = [
    "init_params", "init_params_complex", "apply", "apply_distributed",
    "loss_fn", "train_step", "train_step_distributed",
    "afno", "audio_frontend", "fnet", "fno", "koopman", "s4d", "sfno", "save_checkpoint", "load_checkpoint",
    "init_koopman", "koopman_encode", "koopman_decode", "koopman_rollout", "koopman_loss", "koopman_spectrum",
]
