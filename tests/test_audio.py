import numpy as np
import pytest

from tacotron2_tpu.ops import audio, mulaw, stft_common as sc


def _sine(sr=22050, dur=0.5, freq=440.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_mel_filterbank_shape_and_properties(hp):
    basis = sc.mel_filterbank(hp.sample_rate, hp.n_fft, hp.num_mels, hp.fmin, hp.fmax)
    assert basis.shape == (80, 1025)
    assert np.all(basis >= 0)
    # every filter has some support
    assert np.all(basis.sum(axis=1) > 0)
    # golden values pinned against librosa.filters.mel(22050, 2048, 80, 55, 7600)
    # (slaney norm): peak of filter 0 location and rough scale
    assert 0.005 < basis.max() < 0.05


def test_stft_shape(hp):
    wav = _sine()
    D = audio._stft(wav, hp)
    assert D.shape[0] == hp.n_fft // 2 + 1
    assert D.shape[1] == 1 + len(wav) // hp.get_hop_size()


def test_stft_parseval_peak(hp):
    # 440 Hz sine → spectral peak at bin 440/22050*2048 ≈ 40.9
    wav = _sine()
    D = np.abs(audio._stft(wav, hp))
    peak_bin = D[:, D.shape[1] // 2].argmax()
    assert abs(peak_bin - 41) <= 1


def test_istft_roundtrip(hp):
    wav = _sine()
    D = audio._stft(wav, hp)
    rec = audio._istft(D, hp)
    n = min(len(rec), len(wav))
    # interior samples reconstruct almost exactly (NOLA)
    assert np.max(np.abs(rec[2000:n - 2000] - wav[2000:n - 2000])) < 1e-4


def test_melspectrogram_range(hp):
    mel = audio.melspectrogram(_sine(), hp)
    assert mel.shape[0] == hp.num_mels
    assert mel.min() >= -hp.max_abs_value - 1e-6
    assert mel.max() <= hp.max_abs_value + 1e-6


def test_normalize_denormalize_roundtrip(hp):
    S = np.random.RandomState(0).uniform(hp.min_level_db, 0, size=(80, 100))
    out = audio._denormalize(audio._normalize(S, hp), hp)
    np.testing.assert_allclose(out, S, atol=1e-8)


def test_preemphasis_roundtrip(hp):
    wav = _sine()
    out = audio.inv_preemphasis(audio.preemphasis(wav, 0.97), 0.97)
    np.testing.assert_allclose(out, wav, atol=1e-6)


def test_trim_silence(hp):
    sr = hp.sample_rate
    wav = np.concatenate([np.zeros(sr // 2), _sine(), np.zeros(sr // 2)]).astype(np.float32)
    trimmed = audio.trim_silence(wav, hp)
    assert len(trimmed) < len(wav)
    assert len(trimmed) >= len(_sine()) - 2 * hp.trim_hop_size


def test_griffin_lim_inverts_mel(hp):
    hp.griffin_lim_iters = 10
    wav = _sine(dur=0.3)
    mel = audio.melspectrogram(wav, hp)
    rec = audio.inv_mel_spectrogram(mel, hp)
    assert np.isfinite(rec).all()
    # reconstructed signal has energy at 440 Hz
    spec = np.abs(np.fft.rfft(rec))
    freqs = np.fft.rfftfreq(len(rec), 1 / hp.sample_rate)
    peak = freqs[spec.argmax()]
    assert abs(peak - 440) < 30


def test_mulaw_roundtrip():
    x = np.linspace(-0.9, 0.9, 101)
    np.testing.assert_allclose(mulaw.inv_mulaw(mulaw.mulaw(x, 255), 255), x, atol=1e-10)
    q = mulaw.mulaw_quantize(x, 255)
    assert q.min() >= 0 and q.max() <= 255
    rec = mulaw.inv_mulaw_quantize(q, 255)
    # log companding: quantization error grows with amplitude; one full step at |x|=0.9
    # with floor-quantization is ~0.04
    assert np.max(np.abs(rec - x)) < 0.05


def test_mulaw_jax_matches_numpy():
    import jax.numpy as jnp
    x = np.linspace(-0.99, 0.99, 64).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mulaw.mulaw(jnp.asarray(x), 255)),
                               mulaw.mulaw(x, 255), atol=1e-4)


def test_librosa_pad_lr():
    x = np.zeros(1000)
    l, r = audio.librosa_pad_lr(x, 2048, 275, 1)
    assert l == 0 and (1000 + r) % 275 == 0


def test_wav_io_roundtrip(tmp_path, hp):
    wav = _sine()
    p = str(tmp_path / 'x.wav')
    audio.save_wav(wav, p, hp.sample_rate)
    back = audio.load_wav(p, hp.sample_rate)
    assert len(back) == len(wav)
    # save_wav rescales to full range; compare shape of waveform
    corr = np.corrcoef(back, wav)[0, 1]
    assert corr > 0.999


def test_dsp_golden_vectors(hp):
    """Pinned wav→mel/linear golden vectors (BASELINE north-star: mel MAE ≤ 1e-3).
    Catches any numerical drift in the preemphasis→STFT→mel→dB→normalize chain."""
    import os
    data = np.load(os.path.join(os.path.dirname(__file__), 'golden', 'dsp_golden.npz'))
    mel = audio.melspectrogram(data['wav'], hp)
    lin = audio.linearspectrogram(data['wav'], hp)
    assert float(np.mean(np.abs(mel - data['mel']))) < 1e-3
    assert float(np.mean(np.abs(lin - data['linear']))) < 1e-3
