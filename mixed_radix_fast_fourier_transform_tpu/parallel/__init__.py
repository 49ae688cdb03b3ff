"""Mesh-parallel spectral transforms (new TPU-first subsystem; the reference
has no parallelism of any kind — SURVEY.md §2.3)."""

from .mesh import (
    DATA_AXIS,
    SEQ_AXIS,
    batch_sharding,
    initialize_multihost,
    make_mesh,
    replicated,
)
from .distributed import (
    choose_split,
    fft2_pencil,
    fftn_pencil,
    fftn_pencil2,
    rfftn_pencil2,
    poisson_solve_pencil2,
    ifft2_pencil,
    ifftn_pencil,
    ifftn_pencil2,
    irfftn_pencil2,
    fft_batch_sharded,
    fft_convolve_sharded,
    fft_convolve2_sharded,
    fft_four_step,
    fft_four_step_scrambled,
    ifft_four_step,
    irfft_four_step,
    rfft_four_step,
    ifft_four_step_scrambled,
    isht_recurrence_sharded,
    isht_sharded,
    nufft1_2d_sharded,
    nufft1_sharded,
    nufft2_2d_sharded,
    nufft2_sharded,
    sht_recurrence_sharded,
    sht_sharded,
    shard_batch,
)

__all__ = [
    "DATA_AXIS", "SEQ_AXIS",
    "make_mesh", "batch_sharding", "replicated", "initialize_multihost",
    "choose_split", "fft_four_step", "ifft_four_step",
    "fft_four_step_scrambled", "ifft_four_step_scrambled",
    "fft_convolve_sharded", "fft_convolve2_sharded",
    "fft2_pencil", "ifft2_pencil", "fftn_pencil", "ifftn_pencil",
    "fftn_pencil2", "ifftn_pencil2", "rfftn_pencil2", "irfftn_pencil2", "poisson_solve_pencil2",
    "rfft_four_step", "irfft_four_step",
    "fft_batch_sharded", "shard_batch",
    "nufft1_sharded", "nufft2_sharded", "nufft1_2d_sharded", "nufft2_2d_sharded", "sht_recurrence_sharded", "isht_recurrence_sharded", "sht_sharded", "isht_sharded",
]
