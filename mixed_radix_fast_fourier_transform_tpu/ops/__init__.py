"""Transform ops: complex/real FFT engines, Bluestein, convolution, kernels."""

from .fft import fft, ifft, fft2, ifft2, fftn, ifftn
from .rfft import rfft, irfft, rfftn, irfftn
from .convolve import fft_convolve, fft_correlate
from .stockham import exec_bluestein, exec_complex, exec_mixed_radix
