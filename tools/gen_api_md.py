"""Regenerate API.md from the live package surface (run after adding ops)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import inspect
import mixed_radix_fast_fourier_transform_tpu as sp
from mixed_radix_fast_fourier_transform_tpu import compat, models, parallel

def doc1(obj):
    d = inspect.getdoc(obj) or ""
    line = d.split("\n")[0].strip()
    return line if len(line) < 110 else line[:107] + "..."

groups = {
    "Transforms (numpy.fft-style)": ["fft","ifft","fft2","ifft2","fftn","ifftn","rfft","irfft","rfft2","irfft2","rfftn","irfftn","hfft","ihfft","hfft2","ihfft2","hfftn","ihfftn","dht","idht"],
    "Helpers": ["fftfreq","rfftfreq","fftshift","ifftshift","next_fast_len","prev_fast_len","next_pow2","prime_factors","plan_stages","dividebyN"],
    "Cosine/sine transforms": ["dct","idct","dst","idst","dctn","idctn","dstn","idstn"],
    "Chirp-z / zoom / Hankel": ["czt","zoom_fft","czt_points","fht","ifht","fhtoffset","fwht","ifwht","frft","ifrft","frft2"],
    "Non-uniform FFT": ["nufft1","nufft2","nufft3","nufft3_2d","nufft3_3d","nufft_lsq","nufft_lsq_2d","nufft_lsq_3d","nudft1","nudft2","nufft1_2d","nufft2_2d","nudft1_2d","nudft2_2d","nufft1_3d","nufft2_3d","nudft1_3d","nudft2_3d","radon","iradon"],
    "Convolution / correlation": ["convolve","correlate","fftconvolve","oaconvolve","convolve2d","correlate2d","choose_conv_method","fft_convolve","fft_convolve2","fft_convolven","fft_oaconvolve","fft_correlate","phase_cross_correlation","fourier_shift","unwrap_phase_2d","fourier_gaussian","fourier_uniform","fourier_ellipsoid","wiener"],
    "Time-frequency": ["stft","istft","spectrogram","get_window","griffinlim","phase_vocoder","time_stretch","pitch_shift","mdct","imdct","mdct_window","cwt","ricker","morlet2","dwt","idwt","dwt2","idwt2","wavedec","waverec","wavedec2","waverec2","swt","iswt","swt2","iswt2","wpdec","wprec","wpdec2","wprec2","dwt_max_level","dtcwt","idtcwt","dtcwt2","idtcwt2","wigner_ville","ssq_cwt","ssq_stft","issq_cwt","issq_stft","reassigned_spectrogram","stockwell","istockwell","ambiguity","scattering1d","scattering2d","cqt","icqt","cqt_frequencies","dpss","mel_filterbank","mel_frequencies","melspectrogram","mfcc","hz_to_mel","mel_to_hz","mel_to_stft","mel_to_audio","mfcc_to_mel","mfcc_to_audio","hpss","yin","pyin","pcen","A_weighting","spectral_centroid","spectral_bandwidth","spectral_rolloff","spectral_flatness","spectral_contrast","zero_crossing_rate","rms","specaugment","chroma_filterbank","chroma_stft","onset_strength","tempo","delta","beat_track","decompose","trim","split","mu_law_encode","mu_law_decode","power_to_db","db_to_power","amplitude_to_db","db_to_amplitude","chroma_cqt","tonnetz","gcc_phat"],
    "Signal analysis": ["hilbert","periodogram","welch","csd","coherence","resample","resample_poly","upfirdn","lombscargle","multitaper","rceps","cceps","icceps","minimum_phase","firwin","freqz","kaiser_atten","kaiser_beta","remez","detrend","decimate","savgol_coeffs","savgol_filter","group_delay","deconvolve","hilbert2","chirp","sweep_poly","gausspulse","sawtooth","square","unit_impulse"],
    "Short-time Fourier operator": ["ShortTimeFFT","check_COLA","check_NOLA","closest_STFT_dual_window"],
    "IIR filter design": ["butter","cheby1","cheby2","ellip","bessel","iirfilter","iirdesign","buttap","cheb1ap","cheb2ap","ellipap","besselap","buttord","cheb1ord","cheb2ord","ellipord","band_stop_obj","iirnotch","iirpeak","iircomb","normalize","bilinear","bilinear_zpk","lp2lp","lp2hp","lp2bp","lp2bs","lp2lp_zpk","lp2hp_zpk","lp2bp_zpk","lp2bs_zpk","zpk2tf","tf2zpk","zpk2sos","sos2zpk","tf2sos","sos2tf","findfreqs","BadCoefficients"],
    "FIR filter design": ["firwin2","firls","kaiserord","gammatone","firwin_2d"],
    "Filtering (recursive, scan-based)": ["lfilter","sosfilt","filtfilt","sosfiltfilt","lfilter_zi","sosfilt_zi","lfiltic","freqs","freqs_zpk","freqz_zpk","freqz_sos","sosfreqz","unique_roots","residue","residuez","invres","invresz"],
    "LTI systems": ["lti","dlti","TransferFunction","ZerosPolesGain","StateSpace","place_poles","tf2ss","ss2tf","zpk2ss","ss2zpk","abcd_normalize","cont2discrete","lsim","step","impulse","freqresp","bode","dlsim","dstep","dimpulse","dfreqresp","dbode"],
    "Peak analysis / rank filters": ["find_peaks","find_peaks_cwt","peak_prominences","peak_widths","argrelmin","argrelmax","argrelextrema","medfilt","medfilt2d","order_filter"],
    "B-splines": ["gauss_spline","cspline1d","qspline1d","cspline1d_eval","qspline1d_eval","cspline2d","qspline2d","symiirorder1","symiirorder2","sepfir2d","spline_filter"],
    "Measurement utilities": ["max_len_seq","correlation_lags","vectorstrength","envelope","CZT","ZoomFFT","lpc","tfestimate","xwt","wct","cwt_tc","tc_scales","pfb_analysis","pfb_prototype","pfb_frequencies","goertzel","thd","sinad","sfdr","enob"],
    "Nonstationary / nonlinear analysis": ["emd","eemd","hilbert_huang","vmd","ewt","ewt_boundaries","bispectrum","bicoherence","cohen_class","choi_williams","xwigner_ville","wavelet_denoise","wavelet_denoise2","cycle_spin"],
    "Auditory analysis": ["erb_space","gammatone_filterbank","gammatonegram","modulation_spectrum"],
    "Estimation (parametric / subspace / state-space / adaptive)": ["music","root_music","esprit","pisarenko","prony","corr_matrix","ssa","dmd","dmd_reconstruct","kalman_filter","kalman_smoother","lms_filter","nlms_filter","rls_filter"],
    "PDE toolbox": ["spectral_diff","poisson_solve"],
    "Spherical harmonics": ["sht","isht","sht_grid","sphere_laplacian","poisson_solve_sphere","sphere_convolve","sphere_grad","sphere_div","sphere_vort","sphere_helmholtz","vsht","ivsht","sht_recurrence","isht_recurrence","rotate_sht"],
    "Chebyshev (non-periodic spectral)": ["cheb_points","cheb_transform","icheb_transform","cheb_diff","cheb_diff_coef","cheb_eval"],
    "Plans / config": ["SpectralConfig","get_plan","build_complex_plan","build_real_plan","build_bluestein_plan","build_mixed_radix_plan","clear_plan_cache"],
}
lines = ["# API reference", "",
         "Every public symbol, grouped by family. All transform functions are",
         "jittable, batched over leading axes, and differentiate end-to-end;",
         "`config: SpectralConfig` keyword selects dtype/precision/padding/stage",
         "strategy per call.  Regenerate with `python tools/gen_api_md.py`.", ""]
covered = set()
for title, names in groups.items():
    lines += [f"## {title}", "", "| symbol | summary |", "|---|---|"]
    for n in names:
        lines.append(f"| `{n}` | {doc1(getattr(sp, n))} |")
        covered.add(n)
    lines.append("")
# catch-all: any public symbol not yet grouped still gets documented
leftovers = [n for n in sp.__all__
             if n not in covered and n not in ("__version__", "windows")]
if leftovers:
    lines += ["## Other public symbols", "", "| symbol | summary |", "|---|---|"]
    for n in sorted(leftovers):
        lines.append(f"| `{n}` | {doc1(getattr(sp, n))} |")
    lines.append("")
from mixed_radix_fast_fourier_transform_tpu import windows as _winmod
covered.add("windows")
lines += ["## Windows (`.windows`, scipy.signal.windows surface)", "",
          "| symbol | summary |", "|---|---|"]
for n in _winmod.__all__:
    lines.append(f"| `{n}` | {doc1(getattr(_winmod, n))} |")
lines.append("")
lines += ["## Distributed (`.parallel`)", "", "| symbol | summary |", "|---|---|"]
for n in sorted(n for n in dir(parallel) if not n.startswith("_")):
    obj = getattr(parallel, n)
    if callable(obj):
        lines.append(f"| `{n}` | {doc1(obj)} |")
lines.append("")
lines += ["## Models (`.models`)", "", "| symbol | summary |", "|---|---|"]
for n in models.__all__:
    lines.append(f"| `{n}` | {doc1(getattr(models, n))} |")
lines.append("")
lines += ["## Reference-compatible layer (`.compat`)", "", "| symbol | summary |", "|---|---|"]
for n in sorted(dir(compat)):
    if n.startswith("_"):
        continue
    obj = getattr(compat, n)
    if callable(obj) and getattr(obj, "__module__", "").endswith("compat"):
        lines.append(f"| `{n}` | {doc1(obj)} |")
lines.append("")
open("API.md", "w").write("\n".join(lines) + "\n")
print("API.md written")
