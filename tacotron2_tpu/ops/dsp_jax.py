"""On-device (jittable JAX) DSP: STFT, mel extraction, Griffin-Lim.

TPU-native equivalent of the reference's in-graph TF DSP (datasets/audio.py:118-176:
``inv_mel_spectrogram_tensorflow`` / ``_griffin_lim_tensorflow``, used when
``GL_on_GPU=True``). Everything here is pure and jit-compatible with static shapes;
the FFTs lower to XLA's FFT op. The host/numpy twin is `tacotron2_tpu.ops.audio`.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Hparams
from . import stft_common as sc


def stft(y: jnp.ndarray, n_fft: int, hop_size: int, win_size: int) -> jnp.ndarray:
    """Centered STFT of a 1-D signal → complex (n_fft//2+1, n_frames)."""
    window = jnp.asarray(sc.padded_window(win_size, n_fft), dtype=y.dtype)
    padded = jnp.pad(y, (n_fft // 2, n_fft // 2))
    n_frames = 1 + (padded.shape[0] - n_fft) // hop_size
    starts = jnp.arange(n_frames) * hop_size
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = padded[idx] * window[None, :]
    return jnp.fft.rfft(frames, axis=1).T


def istft(stft_matrix: jnp.ndarray, n_fft: int, hop_size: int, win_size: int) -> jnp.ndarray:
    """Inverse STFT with NOLA window-sum normalization; returns the center-trimmed signal."""
    window = jnp.asarray(sc.padded_window(win_size, n_fft), dtype=jnp.float32)
    frames = jnp.fft.irfft(stft_matrix.T, n=n_fft, axis=1).astype(jnp.float32)
    n_frames = frames.shape[0]
    length = n_fft + hop_size * (n_frames - 1)
    starts = jnp.arange(n_frames) * hop_size
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    y = jnp.zeros((length,), jnp.float32).at[idx].add(frames * window[None, :])
    wss = jnp.zeros((length,), jnp.float32).at[idx].add(jnp.broadcast_to(window ** 2, frames.shape))
    y = y / jnp.maximum(wss, 1e-10)
    return y[n_fft // 2: length - n_fft // 2]


def mel_basis(hp: Hparams) -> jnp.ndarray:
    return jnp.asarray(sc.mel_filterbank(hp.sample_rate, hp.n_fft, hp.num_mels, hp.fmin, hp.fmax))


def inv_mel_basis(hp: Hparams) -> jnp.ndarray:
    return jnp.asarray(sc.inv_mel_filterbank(hp.sample_rate, hp.n_fft, hp.num_mels, hp.fmin, hp.fmax))


def amp_to_db(x: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    min_level = jnp.exp(min_level_db / 20 * jnp.log(10.0))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize(S: jnp.ndarray, hp: Hparams) -> jnp.ndarray:
    ma, ml = hp.max_abs_value, hp.min_level_db
    if hp.symmetric_mels:
        out = (2 * ma) * ((S - ml) / (-ml)) - ma
        return jnp.clip(out, -ma, ma) if hp.allow_clipping_in_normalization else out
    out = ma * ((S - ml) / (-ml))
    return jnp.clip(out, 0, ma) if hp.allow_clipping_in_normalization else out


def denormalize(D: jnp.ndarray, hp: Hparams) -> jnp.ndarray:
    ma, ml = hp.max_abs_value, hp.min_level_db
    if hp.symmetric_mels:
        D = jnp.clip(D, -ma, ma) if hp.allow_clipping_in_normalization else D
        return ((D + ma) * -ml / (2 * ma)) + ml
    D = jnp.clip(D, 0, ma) if hp.allow_clipping_in_normalization else D
    return (D * -ml / ma) + ml


def melspectrogram(wav: jnp.ndarray, hp: Hparams) -> jnp.ndarray:
    """Mel spectrogram of a 1-D signal → (num_mels, n_frames); on-device twin of
    audio.melspectrogram (preemphasis, if any, must be applied by the caller)."""
    D = stft(wav, hp.n_fft, hp.get_hop_size(), hp.get_win_size())
    S = amp_to_db(mel_basis(hp) @ (jnp.abs(D) ** hp.magnitude_power), hp.min_level_db) - hp.ref_level_db
    return normalize(S, hp) if hp.signal_normalization else S


def linearspectrogram(wav: jnp.ndarray, hp: Hparams) -> jnp.ndarray:
    D = stft(wav, hp.n_fft, hp.get_hop_size(), hp.get_win_size())
    S = amp_to_db(jnp.abs(D) ** hp.magnitude_power, hp.min_level_db) - hp.ref_level_db
    return normalize(S, hp) if hp.signal_normalization else S


def griffin_lim(S: jnp.ndarray, hp: Hparams, key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction, fully on device via lax.fori_loop.

    `S` is a magnitude spectrogram (n_freqs, n_frames) already raised to hp.power.
    """
    n_fft, hop, win = hp.n_fft, hp.get_hop_size(), hp.get_win_size()
    mag = jnp.abs(S).astype(jnp.complex64)
    if key is None:
        init_phase = jnp.ones_like(mag)
    else:
        init_phase = jnp.exp(2j * jnp.pi * jax.random.uniform(key, S.shape)).astype(jnp.complex64)
    y = istft(mag * init_phase, n_fft, hop, win)

    def body(_, y):
        est = stft(y, n_fft, hop, win)
        angles = est / jnp.maximum(jnp.abs(est), 1e-8).astype(jnp.complex64)
        return istft(mag * angles, n_fft, hop, win)

    return jax.lax.fori_loop(0, hp.griffin_lim_iters, body, y)


@partial(jax.jit, static_argnames=('hp',))
def inv_mel_spectrogram_jax(mel_spectrogram: jnp.ndarray, hp: Hparams) -> jnp.ndarray:
    """mel (num_mels, n_frames) → waveform; does NOT invert preemphasis (host does).

    On-device twin of reference audio.py:131-143 (``inv_mel_spectrogram_tensorflow``).
    """
    D = denormalize(mel_spectrogram, hp) if hp.signal_normalization else mel_spectrogram
    S = db_to_amp(D + hp.ref_level_db) ** (1.0 / hp.magnitude_power)
    S = jnp.maximum(1e-10, inv_mel_basis(hp) @ S)
    return griffin_lim(S ** hp.power, hp)


@partial(jax.jit, static_argnames=('hp',))
def inv_linear_spectrogram_jax(spectrogram: jnp.ndarray, hp: Hparams) -> jnp.ndarray:
    """linear (num_freq, n_frames) → waveform; on-device twin of audio.py:118-129."""
    D = denormalize(spectrogram, hp) if hp.signal_normalization else spectrogram
    S = db_to_amp(D + hp.ref_level_db) ** (1.0 / hp.magnitude_power)
    return griffin_lim(S ** hp.power, hp)


def inv_preemphasis_scan(wav: jnp.ndarray, k: float) -> jnp.ndarray:
    """IIR inverse preemphasis y[t] = x[t] + k*y[t-1] as a lax.scan (device-friendly)."""
    def step(carry, x):
        y = x + k * carry
        return y, y
    _, out = jax.lax.scan(step, jnp.float32(0.0), wav)
    return out
