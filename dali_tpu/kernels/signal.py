"""Signal-processing kernels: spectrogram, mel filter bank, MFCC, decibels.

Reference: ``dali/kernels/signal/`` (``fft/``, ``dct/``, ``decibel/``) and
``dali/kernels/audio/mel_scale/mel_filter_bank*`` — same window/filterbank math
(HTK and Slaney mel formulas, Slaney-normalized triangular filters, DCT-II with
optional ortho normalization, lifter), written once against an ``xp`` module so
the host (numpy) and device (jnp) paths share code. On TPU the FFT lowers to XLA's
native FFT and the filterbank/DCT are matmuls on the MXU.
"""

from __future__ import annotations

import numpy as np


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (reference fft window; matches DALI's default)."""
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


def frame_signal(
    xp, x, window_length: int, window_step: int, center: bool, reflect_pad: bool, valid_len=None
):
    """Split 1-D signal into frames [n_frames, window_length].

    center=True: frame i is centered at i*step (reference
    ``signal/fft/fft_cpu.cc`` centered windows with reflect padding).

    ``valid_len`` (possibly traced) — the true signal length when ``x`` is a
    padded buffer; boundary handling (reflect/zero) is computed against it via
    gather-index arithmetic, so ragged device batches match the host exactly.
    """
    n_buf = x.shape[-1]
    n = n_buf if valid_len is None else valid_len
    if center:
        pad = window_length // 2
        n_frames = (n_buf if valid_len is None else n_buf) // window_step + 1
        # raw sample positions, possibly out of [0, n)
        pos = (
            xp.arange(window_length)[None, :]
            + xp.arange(n_frames)[:, None] * window_step
            - pad
        )
        if reflect_pad:
            # reflect-101 against the *valid* length: idx = r - |r - (|p| mod 2r)|
            r = xp.maximum(xp.asarray(n) - 1, 1)
            idx = r - xp.abs(r - xp.abs(pos) % (2 * r))
            return x[xp.clip(idx, 0, n_buf - 1)]
        valid = (pos >= 0) & (pos < n)
        idx = xp.clip(pos, 0, n_buf - 1)
        return xp.where(valid, x[idx], 0.0)
    else:
        n_frames = max((n_buf - window_length) // window_step + 1, 0)
        idx = (
            xp.arange(window_length)[None, :]
            + xp.arange(n_frames)[:, None] * window_step
        )
        return x[idx]


def spectrogram(
    xp,
    x,  # [n] float32 signal
    nfft: int,
    window_length: int,
    window_step: int,
    window: np.ndarray,
    power: int = 2,
    center: bool = True,
    reflect_pad: bool = True,
    layout: str = "ft",
    valid_len=None,
):
    """Power/magnitude spectrogram (reference operators/audio/spectrogram.cc:
    output layout 'ft' = [nfft//2+1 frequency bins, frames])."""
    frames = frame_signal(
        xp, x.astype(xp.float32), window_length, window_step, center, reflect_pad, valid_len
    )
    frames = frames * xp.asarray(window, dtype=xp.float32)
    if window_length < nfft:
        # center the window within the FFT frame (reference fft_cpu)
        lpad = (nfft - window_length) // 2
        frames = xp.pad(frames, ((0, 0), (lpad, nfft - window_length - lpad)))
    spec = xp.fft.rfft(frames, n=nfft, axis=-1)
    mag = xp.abs(spec)
    if power == 2:
        mag = mag * mag
    out = mag.astype(xp.float32)
    if layout == "ft":
        out = out.T
    return out


def mel_hz_to_mel(f, formula: str):
    f = np.asarray(f, np.float64)
    if formula == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, logarithmic above (reference mel_scale.h)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def mel_mel_to_hz(m, formula: str):
    m = np.asarray(m, np.float64)
    if formula == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    hz = m * f_sp
    above = m >= min_log_mel
    hz = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), hz)
    return hz


def mel_filter_bank_matrix(
    nfilter: int,
    nfft: int,
    sample_rate: float,
    freq_low: float = 0.0,
    freq_high: float = None,
    formula: str = "slaney",
    normalize: bool = True,
) -> np.ndarray:
    """[nfilter, nfft//2+1] triangular filter bank (reference
    ``mel_filter_bank.h``; Slaney area normalization when normalize=True)."""
    if freq_high is None or freq_high <= 0:
        freq_high = sample_rate / 2
    n_bins = nfft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_bins)
    mel_lo = mel_hz_to_mel(freq_low, formula)
    mel_hi = mel_hz_to_mel(freq_high, formula)
    mel_pts = np.linspace(mel_lo, mel_hi, nfilter + 2)
    hz_pts = mel_mel_to_hz(mel_pts, formula)
    weights = np.zeros((nfilter, n_bins), np.float64)
    for i in range(nfilter):
        lo, cen, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lo) / max(cen - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - cen, 1e-10)
        weights[i] = np.maximum(0.0, np.minimum(up, down))
        if normalize:
            enorm = 2.0 / (hi - lo)
            weights[i] *= enorm
    return weights.astype(np.float32)


def dct_matrix(n_out: int, n_in: int, dct_type: int = 2, normalize: bool = False, xp=np) -> np.ndarray:
    """DCT matrix [n_out, n_in] (reference ``signal/dct/dct_cpu.cc``; type 2 with
    optional ortho normalization)."""
    k = np.arange(n_out)[:, None]
    i = np.arange(n_in)[None, :]
    if dct_type == 2:
        m = np.cos(np.pi * k * (2 * i + 1) / (2 * n_in))
        if normalize:
            m *= np.sqrt(2.0 / n_in)
            m[0] *= 1.0 / np.sqrt(2.0)
        else:
            m *= 2.0
    elif dct_type == 1:
        m = np.cos(np.pi * k * i / max(n_in - 1, 1))
    elif dct_type == 3:
        m = np.cos(np.pi * (2 * k + 1) * i / (2 * n_in))
        m[:, 0] *= 0.5
        m *= 2.0
    else:
        raise ValueError(f"Unsupported dct_type {dct_type}")
    return m.astype(np.float32)


def to_decibels(xp, x, multiplier: float = 10.0, s_ref=None, cutoff_db: float = -80.0):
    """reference ``signal/decibel/``: out = multiplier * log10(max(x, eps) / ref),
    clipped at cutoff_db. s_ref=None → per-sample max."""
    ref = xp.max(x) if s_ref is None else s_ref
    ref = xp.maximum(ref, 1e-20)
    min_ratio = 10.0 ** (cutoff_db / multiplier)
    out = multiplier * xp.log10(xp.maximum(x / ref, min_ratio))
    return out.astype(xp.float32)


def preemphasis(xp, x, coeff: float, border: str = "clamp"):
    """y[0] = x[0] - coeff*border_value; y[t] = x[t] - coeff*x[t-1].
    border_value: 0 ('zero'), x[0] ('clamp'), x[1] ('reflect') — reference
    operators/audio/preemphasis_filter_op.cc:35-37."""
    x = x.astype(xp.float32)
    prev = xp.concatenate([x[:1], x[:-1]])
    if border == "zero":
        first = xp.zeros((), xp.float32)
    elif border == "reflect":
        first = x[1] if x.shape[0] > 1 else x[0]
    else:  # clamp
        first = x[0]
    if xp is np:
        prev = prev.copy()
        prev[0] = first
    else:
        prev = prev.at[0].set(first)
    y = x - coeff * prev
    return y


def moving_mean_square(xp, x, window: int):
    """Mean of squares over windows *starting* at each index (reference
    signal/moving_mean_square.cc); output length = len(x) - window + 1."""
    xx = (x.astype(xp.float32)) ** 2
    cs = xp.cumsum(xp.concatenate([xp.zeros((1,), xx.dtype), xx]))
    n = xx.shape[0]
    m = max(n - window + 1, 1)
    lo = xp.arange(m)
    return (cs[lo + min(window, n)] - cs[lo]) / window


def sinc_resample(jnp, x, in_rate, out_rate, out_len: int, taps: int = 32):
    """Kaiser-windowed sinc resampling on the device (reference
    ``kernels/signal/resampling.h`` — same structure: per-output-sample gather
    of ``taps`` neighbors, weights evaluated at the fractional position, cutoff
    scaled for downsampling).

    x: [L] or [L, C]; in_rate/out_rate: scalars (may be traced);
    out_len: static output canvas length. Returns [out_len, ...].
    """
    L = x.shape[0]
    step = in_rate / out_rate
    cutoff = jnp.minimum(1.0, out_rate / in_rate)
    pos = jnp.arange(out_len, dtype=jnp.float32) * step  # [O]
    base = jnp.floor(pos).astype(jnp.int32)
    frac = pos - base.astype(jnp.float32)
    k = jnp.arange(-(taps // 2) + 1, taps // 2 + 1, dtype=jnp.float32)  # [T]
    arg = (k[None, :] - frac[:, None]) * cutoff  # [O, T]
    # kaiser(beta=16) * sinc, evaluated via i0 approximation
    beta = 16.0
    t_norm = arg / (taps / 2.0 * cutoff)
    inside = jnp.abs(t_norm) < 1.0
    w_kaiser = _i0(jnp, beta * jnp.sqrt(jnp.maximum(1.0 - t_norm * t_norm, 0.0))) / _i0(
        jnp, jnp.asarray(beta)
    )
    w = jnp.where(inside, w_kaiser * jnp.sinc(arg) * cutoff, 0.0)  # [O, T]
    idx = jnp.clip(base[:, None] + k.astype(jnp.int32)[None, :], 0, L - 1)  # [O, T]
    g = x[idx]  # [O, T] or [O, T, C]
    if g.ndim == 3:
        return jnp.einsum("otc,ot->oc", g, w)
    return jnp.einsum("ot,ot->o", g, w)


def _i0(jnp, x):
    """Modified Bessel I0 (Abramowitz & Stegun 9.8.1/9.8.2 polynomial fit)."""
    ax = jnp.abs(x)
    t = ax / 3.75
    small = 1.0 + 3.5156229 * t**2 + 3.0899424 * t**4 + 1.2067492 * t**6 + \
        0.2659732 * t**8 + 0.0360768 * t**10 + 0.0045813 * t**12
    ti = 3.75 / jnp.maximum(ax, 1e-9)
    big = (jnp.exp(ax) / jnp.sqrt(jnp.maximum(ax, 1e-9))) * (
        0.39894228 + 0.01328592 * ti + 0.00225319 * ti**2 - 0.00157565 * ti**3
        + 0.00916281 * ti**4 - 0.02057706 * ti**5 + 0.02635537 * ti**6
        - 0.01647633 * ti**7 + 0.00392377 * ti**8
    )
    return jnp.where(ax < 3.75, small, big)
