"""Audio operators: decode, preemphasis, spectrogram, mel, MFCC, decibels,
nonsilent region, resample.

Reference: ``dali/operators/decoder/audio/`` (libsndfile decode,
``generic_decoder.cc:16,140``), ``dali/operators/audio/`` (preemphasis_filter.cc,
spectrogram.cc, mel_filter_bank.cc, mfcc.cc, to_decibels, nonsilent_region.cc,
resample.cc). Host decode is a built-in WAV parser (no libsndfile in the image);
the spectral chain lowers to XLA FFT + MXU matmuls via
:mod:`dali_tpu.kernels.signal`.
"""

from __future__ import annotations

import struct

import numpy as np

from .._schema import DALI_SCHEMA, ArgType, register_operator
from ..batch import DeviceBatch, HostBatch
from ..kernels import signal as sig
from ..types import DALIDataType, to_jnp_type, to_numpy_type
from .base import Operator

# ====================================== decoders.Audio ============================================


def decode_wav(data: bytes):
    """Minimal RIFF/WAVE decoder: PCM 8/16/24/32-bit and IEEE float
    (host-side analogue of the reference libsndfile decode)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("Not a WAV file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError("Malformed WAV: missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(data) >= 0:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = 1
    if audio_format == 1:  # PCM
        if bits == 8:
            x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(raw, np.int32).astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"Unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(raw, np.float32 if bits == 32 else np.float64).astype(np.float32)
    else:
        raise ValueError(f"Unsupported WAV format {audio_format}")
    if channels > 1:
        x = x.reshape(-1, channels)
    return x, float(sample_rate)


def decode_audio(data: bytes):
    """WAV via the built-in RIFF parser; FLAC/OGG/MP3/anything-else via the
    native FFmpeg decoder (native/src/audio_decode.cc — the analogue of the
    reference's libsndfile generic decoder)."""
    if data[:4] == b"RIFF":
        return decode_wav(data)
    from .. import native

    out = native.audio_decode(data)
    if out is None:
        raise ValueError(
            "Undecodable audio (native FFmpeg decoder unavailable or stream "
            "unsupported); built-in parser handles WAV only"
        )
    return out


DALI_SCHEMA("decoders.Audio").DocStr(
    """Decodes audio: WAV (built-in parser), FLAC/OGG/MP3 (native FFmpeg
    decoder). Reference ``decoders__Audio`` uses libsndfile for WAV/FLAC/OGG
    (dali/operators/decoder/audio/generic_decoder.cc:16).
    Outputs (audio, sample_rate)."""
).NumInput(1).NumOutput(2).Devices("cpu").AddOptionalArg(
    "sample_rate", ArgType.FLOAT, "Resample to this rate (0 = keep).", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "downmix", ArgType.BOOL, "Downmix to mono.", False
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype (FLOAT: [-1,1]; INT16: raw).", DALIDataType.FLOAT
).AddOptionalArg("quality", ArgType.FLOAT, "Resampling quality (0..100).", 50.0)


def _resample_audio(x: np.ndarray, in_rate: float, out_rate: float) -> np.ndarray:
    """Windowed-sinc resampling via polyphase (reference signal/resampling_cpu.cc)."""
    if abs(in_rate - out_rate) < 1e-9:
        return x
    from fractions import Fraction

    import scipy.signal

    frac = Fraction(out_rate / in_rate).limit_denominator(10000)
    return scipy.signal.resample_poly(x, frac.numerator, frac.denominator, axis=0).astype(np.float32)


@register_operator("decoders.Audio", "cpu")
class AudioDecoderCPU(Operator):
    def run_sample(self, ctx, idx, encoded):
        data = np.ascontiguousarray(encoded).tobytes()
        x, rate = decode_audio(data)
        if self.spec.GetArgument("downmix", False) and x.ndim == 2:
            x = x.mean(axis=1)
        target = float(np.asarray(ctx.arg(self, "sample_rate", idx, 0.0)))
        if target > 0:
            x = _resample_audio(x, rate, target)
            rate = target
        dt = self.spec.GetArgument("dtype", DALIDataType.FLOAT)
        if dt == DALIDataType.INT16:
            x = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
        else:
            x = x.astype(to_numpy_type(dt))
        return x, np.float32(rate)

    def output_layout(self, output_idx, inputs):
        return "" if output_idx else "t"


# Mixed audio decode: host entropy decode, device-resident output. When the
# requested dtype is FLOAT and the PCM is exactly int16/32768 (i.e. the
# source was 16-bit, the common case for speech corpora), the samples ride
# the wire as int16 and the division happens on device — HALF the
# host→device audio bytes. TPU-native extension; the reference decoder is
# CPU-only (decoder/audio/generic_decoder.cc).

DALI_SCHEMA("_AudioStage").DocStr(
    "Host half of the mixed audio decode: decoded PCM staged at wire "
    "precision (int16 when exact) + per-sample rate."
).NumInput(1).NumOutput(2).Devices("mixed").MakeInternal().AddOptionalArg(
    "sample_rate", ArgType.FLOAT, "Resample to this rate (0 = keep).", 0.0, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "downmix", ArgType.BOOL, "Downmix to mono.", False
).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Requested output dtype.", DALIDataType.FLOAT
).AddOptionalArg("quality", ArgType.FLOAT, "Resampling quality (0..100).", 50.0)


@register_operator("_AudioStage", "mixed")
class AudioStageMixed(AudioDecoderCPU):
    def run_batch(self, ctx, inp):
        dt = self.spec.GetArgument("dtype", DALIDataType.FLOAT)
        outs = ctx.map_samples(
            lambda i: self._decode_one(ctx, i, inp.samples[i]), len(inp.samples)
        )
        pcm = [o[0] for o in outs]
        rates = [np.float32(o[1]) for o in outs]  # 0-d, like the cpu decoder
        if dt == DALIDataType.FLOAT:
            # int16 wire iff EVERY sample converts exactly (uniform batch dtype)
            scaled = [x * 32768.0 for x in pcm]
            if all(
                np.all(s >= -32768) and np.all(s <= 32767) and np.all(s == np.round(s))
                for s in scaled
            ):
                pcm = [s.astype(np.int16) for s in scaled]
        return [HostBatch(pcm, layout=self.output_layout(0, None)),
                HostBatch(rates, layout="")]

    def _decode_one(self, ctx, idx, encoded):
        data = np.ascontiguousarray(encoded).tobytes()
        x, rate = decode_audio(data)
        if self.spec.GetArgument("downmix", False) and x.ndim == 2:
            x = x.mean(axis=1)
        target = float(np.asarray(ctx.arg(self, "sample_rate", idx, 0.0)))
        if target > 0:
            x = _resample_audio(x, rate, target)
            rate = target
        dt = self.spec.GetArgument("dtype", DALIDataType.FLOAT)
        if dt == DALIDataType.INT16:
            x = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
        elif dt != DALIDataType.FLOAT:
            x = x.astype(to_numpy_type(dt))
        return np.ascontiguousarray(x, dtype=x.dtype), np.float32(rate)


DALI_SCHEMA("_AudioToOutput").DocStr(
    "Device half of the mixed audio decode: converts wire-precision PCM to "
    "the requested dtype (int16 wire -> float/32768 on device)."
).NumInput(1).NumOutput(1).Devices("gpu").MakeInternal().AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Requested output dtype.", DALIDataType.FLOAT
)


@register_operator("_AudioToOutput", "gpu")
class AudioToOutput(Operator):
    def lower(self, dctx, pcm):
        import jax.numpy as jnp

        dt = self.spec.GetArgument("dtype", DALIDataType.FLOAT)
        data = pcm.data
        if dt == DALIDataType.FLOAT:
            if data.dtype == jnp.int16:
                data = data.astype(jnp.float32) * (1.0 / 32768.0)
            else:
                data = data.astype(jnp.float32)
        return [DeviceBatch(data, pcm.shapes, pcm.layout)]


# ====================================== PreemphasisFilter ==========================================

DALI_SCHEMA("PreemphasisFilter").DocStr(
    "y[t] = x[t] - coeff * x[t-1] (reference audio/preemphasis_filter.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "preemph_coeff", ArgType.FLOAT, "Preemphasis coefficient.", 0.97, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "border", ArgType.STRING, "'clamp' or 'zero' first-sample handling.", "clamp"
).AddOptionalArg("dtype", ArgType.DATA_TYPE, "Output dtype.", DALIDataType.FLOAT)


@register_operator("PreemphasisFilter", "cpu")
class PreemphasisCPU(Operator):
    def run_sample(self, ctx, idx, x):
        coeff = float(np.asarray(ctx.arg(self, "preemph_coeff", idx, 0.97)))
        return sig.preemphasis(np, x, coeff, self.spec.GetArgument("border", "clamp"))


@register_operator("PreemphasisFilter", "gpu")
class PreemphasisGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        coeff = dctx.arg(self, "preemph_coeff", 0.97)
        border = self.spec.GetArgument("border", "clamp")
        x = inp.data.astype(jnp.float32)
        prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        if border == "zero":
            prev = prev.at[:, 0].set(0.0)
        elif border == "reflect":  # y[0] = x[0] - coeff*x[1] (ref op.cc:37)
            prev = prev.at[:, 0].set(x[:, 1] if x.shape[1] > 1 else x[:, 0])
        if hasattr(coeff, "ndim") and getattr(coeff, "ndim", 0) >= 1:
            coeff = coeff.reshape(-1, *([1] * (x.ndim - 1)))
        out = x - coeff * prev
        return [inp.with_data(out)]


# ====================================== Spectrogram ================================================

DALI_SCHEMA("Spectrogram").DocStr(
    "Power spectrogram, layout 'ft' (reference audio/spectrogram.cc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "nfft", ArgType.INT, "FFT size (default window_length).", None
).AddOptionalArg(
    "window_length", ArgType.INT, "Window size in samples.", 512
).AddOptionalArg(
    "window_step", ArgType.INT, "Hop size in samples.", 256
).AddOptionalArg(
    "window_fn", ArgType.FLOAT_VEC, "Window coefficients (default Hann).", None
).AddOptionalArg(
    "power", ArgType.INT, "1 = magnitude, 2 = power.", 2
).AddOptionalArg(
    "center_windows", ArgType.BOOL, "Center windows on signal samples.", True
).AddOptionalArg(
    "reflect_padding", ArgType.BOOL, "Reflect-pad at boundaries.", True
).AddOptionalArg("layout", ArgType.TENSOR_LAYOUT, "'ft' or 'tf'.", "ft")


class _SpecCommon(Operator):
    def _params(self):
        wl = self.spec.GetArgument("window_length", 512)
        nfft = self.spec.GetArgument("nfft", None) or wl
        step = self.spec.GetArgument("window_step", 256)
        wf = self.spec.GetArgument("window_fn", None)
        window = np.asarray(wf, np.float32) if wf else sig.hann_window(wl)
        return nfft, wl, step, window


@register_operator("Spectrogram", "cpu")
class SpectrogramCPU(_SpecCommon):
    def run_sample(self, ctx, idx, x):
        nfft, wl, step, window = self._params()
        return sig.spectrogram(
            np, x.reshape(-1), nfft, wl, step, window,
            self.spec.GetArgument("power", 2),
            self.spec.GetArgument("center_windows", True),
            self.spec.GetArgument("reflect_padding", True),
            self.spec.GetArgument("layout", "ft"),
        )

    def output_layout(self, output_idx, inputs):
        return self.spec.GetArgument("layout", "ft")


@register_operator("Spectrogram", "gpu")
class SpectrogramGPU(_SpecCommon):
    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        nfft, wl, step, window = self._params()
        power = self.spec.GetArgument("power", 2)
        center = self.spec.GetArgument("center_windows", True)
        reflect = self.spec.GetArgument("reflect_padding", True)
        layout = self.spec.GetArgument("layout", "ft")

        if inp.shapes is not None:
            lens_in = inp.shapes[:, 0]
            fn = lambda x, n: sig.spectrogram(
                jnp, x, nfft, wl, step, window, power, center, reflect, layout, valid_len=n
            )
            out = jax.vmap(fn)(inp.data.reshape(inp.data.shape[0], -1), lens_in)
        else:
            fn = lambda x: sig.spectrogram(jnp, x, nfft, wl, step, window, power, center, reflect, layout)
            out = jax.vmap(fn)(inp.data.reshape(inp.data.shape[0], -1))
        shapes = None
        if inp.shapes is not None:
            lens = inp.shapes[:, 0]
            frames = lens // step + 1 if center else (lens - wl) // step + 1
            n_bins = nfft // 2 + 1
            import jax.numpy as jnp2

            if layout == "ft":
                shapes = jnp.stack([jnp.full_like(frames, n_bins), frames], axis=1)
            else:
                shapes = jnp.stack([frames, jnp.full_like(frames, n_bins)], axis=1)
        return [DeviceBatch(out, shapes, layout)]


# ====================================== MelFilterBank ==============================================

DALI_SCHEMA("MelFilterBank").DocStr(
    "Projects a spectrogram onto triangular mel filters (reference "
    "audio/mel_filter_bank.cc; Slaney formula + normalization by default)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "nfilter", ArgType.INT, "Number of mel bins.", 128
).AddOptionalArg(
    "sample_rate", ArgType.FLOAT, "Input audio sample rate.", 44100.0
).AddOptionalArg(
    "freq_low", ArgType.FLOAT, "Lowest frequency.", 0.0
).AddOptionalArg(
    "freq_high", ArgType.FLOAT, "Highest frequency (0 = Nyquist).", 0.0
).AddOptionalArg(
    "normalize", ArgType.BOOL, "Slaney area normalization.", True
).AddOptionalArg("mel_formula", ArgType.STRING, "'slaney' or 'htk'.", "slaney")


class _MelCommon(Operator):
    def _weights(self, n_bins):
        nfft = (n_bins - 1) * 2
        return sig.mel_filter_bank_matrix(
            self.spec.GetArgument("nfilter", 128),
            nfft,
            self.spec.GetArgument("sample_rate", 44100.0),
            self.spec.GetArgument("freq_low", 0.0),
            self.spec.GetArgument("freq_high", 0.0) or None,
            self.spec.GetArgument("mel_formula", "slaney"),
            self.spec.GetArgument("normalize", True),
        )


@register_operator("MelFilterBank", "cpu")
class MelFilterBankCPU(_MelCommon):
    def run_sample(self, ctx, idx, spec):
        w = self._weights(spec.shape[0])
        return (w @ spec.astype(np.float32)).astype(np.float32)


@register_operator("MelFilterBank", "gpu")
class MelFilterBankGPU(_MelCommon):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        n_bins = inp.data.shape[1]
        w = jnp.asarray(self._weights(n_bins))
        out = jnp.einsum("mf,nft->nmt", w, inp.data.astype(jnp.float32))
        shapes = None
        if inp.shapes is not None:
            nmel = w.shape[0]
            shapes = jnp.stack(
                [jnp.full((inp.data.shape[0],), nmel, jnp.int32), inp.shapes[:, 1]], axis=1
            )
        return [DeviceBatch(out, shapes, inp.layout)]


# ====================================== MFCC ========================================================

DALI_SCHEMA("MFCC").DocStr(
    "Mel-frequency cepstral coefficients (reference audio/mfcc/mfcc.cc): DCT over "
    "the mel axis with optional liftering."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "n_mfcc", ArgType.INT, "Number of coefficients.", 20
).AddOptionalArg(
    "dct_type", ArgType.INT, "DCT type (1, 2, or 3).", 2
).AddOptionalArg(
    "normalize", ArgType.BOOL, "Ortho-normalize the DCT.", False
).AddOptionalArg(
    "lifter", ArgType.FLOAT, "Cepstral liftering coefficient.", 0.0
).AddOptionalArg("axis", ArgType.INT, "Axis to transform.", 0)


class _MFCCCommon(Operator):
    def _matrix(self, n_in):
        return sig.dct_matrix(
            self.spec.GetArgument("n_mfcc", 20),
            n_in,
            self.spec.GetArgument("dct_type", 2),
            self.spec.GetArgument("normalize", False),
        )

    def _lifter_vec(self):
        lifter = self.spec.GetArgument("lifter", 0.0)
        n = self.spec.GetArgument("n_mfcc", 20)
        if not lifter:
            return None
        return (1.0 + lifter / 2.0 * np.sin(np.pi * np.arange(n) / lifter)).astype(np.float32)


@register_operator("MFCC", "cpu")
class MFCCCPU(_MFCCCommon):
    def run_sample(self, ctx, idx, mel):
        axis = self.spec.GetArgument("axis", 0)
        m = self._matrix(mel.shape[axis])
        x = np.moveaxis(mel.astype(np.float32), axis, 0)
        out = np.tensordot(m, x, axes=(1, 0))
        lift = self._lifter_vec()
        if lift is not None:
            out = out * lift.reshape(-1, *([1] * (out.ndim - 1)))
        return np.moveaxis(out, 0, axis).astype(np.float32)


@register_operator("MFCC", "gpu")
class MFCCGPU(_MFCCCommon):
    def lower(self, dctx, inp: DeviceBatch):
        import jax.numpy as jnp

        axis = self.spec.GetArgument("axis", 0) + 1
        m = jnp.asarray(self._matrix(inp.data.shape[axis]))
        x = jnp.moveaxis(inp.data.astype(jnp.float32), axis, 1)
        out = jnp.einsum("km,nm...->nk...", m, x)
        lift = self._lifter_vec()
        if lift is not None:
            out = out * jnp.asarray(lift).reshape(1, -1, *([1] * (out.ndim - 2)))
        out = jnp.moveaxis(out, 1, axis)
        shapes = inp.shapes
        if shapes is not None:
            n_mfcc = self.spec.GetArgument("n_mfcc", 20)
            shapes = shapes.at[:, axis - 1].set(n_mfcc)
        return [DeviceBatch(out, shapes, inp.layout)]


# ====================================== ToDecibels ==================================================

DALI_SCHEMA("ToDecibels").DocStr(
    "out = multiplier * log10(x / reference), clipped (reference audio/to_decibels)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "multiplier", ArgType.FLOAT, "Usually 10 (power) or 20 (magnitude).", 10.0
).AddOptionalArg(
    "reference", ArgType.FLOAT, "Reference value (0 = per-sample max).", 0.0
).AddOptionalArg("cutoff_db", ArgType.FLOAT, "Minimum output value.", -200.0)


@register_operator("ToDecibels", "cpu")
class ToDecibelsCPU(Operator):
    def run_sample(self, ctx, idx, x):
        ref = self.spec.GetArgument("reference", 0.0)
        return sig.to_decibels(
            np, x.astype(np.float32),
            self.spec.GetArgument("multiplier", 10.0),
            None if ref == 0.0 else ref,
            self.spec.GetArgument("cutoff_db", -200.0),
        )


@register_operator("ToDecibels", "gpu")
class ToDecibelsGPU(Operator):
    def lower(self, dctx, inp: DeviceBatch):
        import jax
        import jax.numpy as jnp

        ref = self.spec.GetArgument("reference", 0.0)
        mult = self.spec.GetArgument("multiplier", 10.0)
        cutoff = self.spec.GetArgument("cutoff_db", -200.0)
        if ref == 0.0 and inp.shapes is None:
            fn = lambda x: sig.to_decibels(jnp, x, mult, None, cutoff)
            out = jax.vmap(fn)(inp.data.astype(jnp.float32))
        else:
            # ragged: mask padding out of the max
            x = inp.data.astype(jnp.float32)
            if ref == 0.0:
                mask = _valid_mask(jnp, inp)
                ref_v = jnp.max(jnp.where(mask, x, -jnp.inf), axis=tuple(range(1, x.ndim)), keepdims=True)
            else:
                ref_v = ref
            out = sig.to_decibels(jnp, x, mult, jnp.maximum(ref_v, 1e-20), cutoff)
        return [inp.with_data(out)]


def _valid_mask(jnp, inp: DeviceBatch):
    mask = None
    for d in range(inp.data.ndim - 1):
        ext = inp.extent(d)
        idx = jnp.arange(inp.data.shape[d + 1])
        m = idx.reshape(*([1] * (d + 1)), -1, *([1] * (inp.data.ndim - d - 2))) < ext.reshape(
            -1, *([1] * (inp.data.ndim - 1))
        )
        mask = m if mask is None else (mask & m)
    return mask


# ====================================== NonsilentRegion =============================================

DALI_SCHEMA("NonsilentRegion").DocStr(
    "Finds the leading/trailing non-silence (reference audio/nonsilence_op.cc): "
    "outputs (begin, length) of the region above cutoff_db."
).NumInput(1).NumOutput(2).Devices("cpu", "gpu").AddOptionalArg(
    "cutoff_db", ArgType.FLOAT, "Silence threshold relative to reference.", -60.0
).AddOptionalArg(
    "window_length", ArgType.INT, "Moving-mean-square window.", 2048
).AddOptionalArg(
    "reference_power", ArgType.FLOAT, "Reference power (0 = per-sample max).", 0.0
).AddOptionalArg("reset_interval", ArgType.INT, "Compatibility no-op.", 8192)


@register_operator("NonsilentRegion", "cpu")
class NonsilentRegionCPU(Operator):
    def run_sample(self, ctx, idx, x):
        x = x.reshape(-1).astype(np.float32)
        win = min(self.spec.GetArgument("window_length", 2048), max(len(x), 1))
        mms = sig.moving_mean_square(np, x, win)
        ref = self.spec.GetArgument("reference_power", 0.0)
        ref = mms.max() if ref == 0.0 else ref
        cutoff = self.spec.GetArgument("cutoff_db", -60.0)
        thresh = ref * (10.0 ** (cutoff / 10.0))
        above = mms >= max(thresh, 1e-20)
        if not above.any():
            return np.int32(0), np.int32(0)
        begin = int(np.argmax(above))  # first window (starting index) above
        last = len(above) - 1 - int(np.argmax(above[::-1]))
        end = min(last + win, len(x))
        return np.int32(begin), np.int32(end - begin)

    def output_layout(self, output_idx, inputs):
        return ""


# ====================================== AudioResample ===============================================

DALI_SCHEMA("experimental.AudioResample").DocStr(
    "Resamples audio (reference operators/audio/resample.cc; windowed sinc)."
).NumInput(1).NumOutput(1).Devices("cpu", "gpu").AddOptionalArg(
    "in_rate", ArgType.FLOAT, "Input rate.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "out_rate", ArgType.FLOAT, "Output rate.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "scale", ArgType.FLOAT, "Rate scale factor.", None, tensor_ok=True, per_sample=True
).AddOptionalArg(
    "out_length", ArgType.INT, "Output length.", None, tensor_ok=True, per_sample=True
).AddOptionalArg("quality", ArgType.FLOAT, "Quality 0..100.", 50.0).AddOptionalArg(
    "dtype", ArgType.DATA_TYPE, "Output dtype.", None
)


@register_operator("experimental.AudioResample", "cpu")
class AudioResampleCPU(Operator):
    def run_sample(self, ctx, idx, x):
        scale = ctx.arg(self, "scale", idx, None)
        if scale is None:
            in_rate = float(np.asarray(ctx.arg(self, "in_rate", idx, 1.0)))
            out_rate = float(np.asarray(ctx.arg(self, "out_rate", idx, 1.0)))
        else:
            in_rate, out_rate = 1.0, float(np.asarray(scale))
        out = _resample_audio(x.astype(np.float32), in_rate, out_rate)
        dt = self.spec.GetArgument("dtype", None)
        return out.astype(to_numpy_type(dt)) if dt is not None else out


@register_operator("experimental.AudioResample", "gpu")
class AudioResampleGPU(Operator):
    """Device resampling (reference ``operators/audio/resample.cc`` GPU backend
    via kernels/signal/resampling.h): Kaiser-windowed sinc, one gather+reduce
    per output sample — [out_len, taps] einsum work the VPU eats. Per-sample
    rates produce ragged outputs on a grow-policy canvas."""

    def __init__(self, spec, op_id):
        super().__init__(spec, op_id)
        self._grow = [0]

    def _rates(self, ctx, i):
        scale = ctx.arg(self, "scale", i, None)
        if scale is not None:
            return 1.0, float(np.asarray(scale))
        return (
            float(np.asarray(ctx.arg(self, "in_rate", i, 1.0))),
            float(np.asarray(ctx.arg(self, "out_rate", i, 1.0))),
        )

    def host_params(self, ctx, input_shapes):
        shapes = input_shapes[0]
        if shapes is None:
            raise RuntimeError("AudioResample(gpu) requires host-known input shapes")
        n = shapes.shape[0]
        rates = np.zeros((n, 2), np.float32)
        out_len = np.zeros((n,), np.int32)
        for i in range(n):
            ir, orate = self._rates(ctx, i)
            rates[i] = (ir, orate)
            ol = ctx.arg(self, "out_length", i, None)
            out_len[i] = int(np.asarray(ol)) if ol is not None else int(
                round(int(shapes[i, 0]) * orate / ir)
            )
        self._grow[0] = max(self._grow[0], int(-(-int(out_len.max()) // 128) * 128))
        self._out_shapes = np.concatenate(
            [out_len[:, None], shapes[:, 1:].astype(np.int32)], axis=1
        )
        return {"ar_rates": rates, "ar_out_len": out_len}

    def device_statics(self, ctx, input_shapes):
        return (self._grow[0],)

    def host_output_shapes(self, ctx, input_shapes, input_batches):
        return [getattr(self, "_out_shapes", None)]

    def lower(self, dctx, inp):
        import jax
        import jax.numpy as jnp

        from ..kernels.signal import sinc_resample

        (max_out,) = dctx.static(self)
        rates = dctx.param(self, "ar_rates")
        out_len = dctx.param(self, "ar_out_len")
        quality = float(self.spec.GetArgument("quality", 50.0))
        taps = 16 if quality <= 30 else (64 if quality > 80 else 32)

        def one(x, r):
            return sinc_resample(jnp, x.astype(jnp.float32), r[0], r[1], max_out, taps)

        out = jax.vmap(one)(inp.data, rates)
        dt = self.spec.GetArgument("dtype", None)
        if dt is not None:
            out = out.astype(to_jnp_type(dt))
        ndim = out.ndim - 1
        if inp.shapes is not None and ndim > 1:
            shapes = jnp.concatenate([out_len[:, None], inp.shapes[:, 1:]], axis=1)
        else:
            extra = [jnp.full((out.shape[0],), d, jnp.int32) for d in out.shape[2:]]
            shapes = jnp.stack([out_len.astype(jnp.int32)] + extra, axis=1)
        return [DeviceBatch(out, shapes, inp.layout)]
