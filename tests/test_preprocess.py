import os

import numpy as np
import pytest
from scipy.io import wavfile

from tacotron2_tpu.data import preprocessor


def make_corpus(root, sr=22050, n=3):
    wav_dir = os.path.join(root, 'wavs')
    os.makedirs(wav_dir, exist_ok=True)
    rows = []
    rng = np.random.default_rng(0)
    for i in range(n):
        name = f'UT-{i:04d}'
        dur = 0.4 + 0.2 * i
        t = np.arange(int(sr * dur)) / sr
        wav = 0.5 * np.sin(2 * np.pi * (200 + 100 * i) * t) + 0.01 * rng.standard_normal(len(t))
        wavfile.write(os.path.join(wav_dir, name + '.wav'), sr, (wav * 32767).astype(np.int16))
        rows.append(f'{name}|raw text {i}|Normalized text {i}.')
    with open(os.path.join(root, 'metadata.csv'), 'w') as f:
        f.write('\n'.join(rows) + '\n')
    return root


@pytest.fixture()
def corpus(tmp_path):
    return make_corpus(str(tmp_path / 'LJmini'))


def test_build_from_path(tmp_path, corpus, hp):
    out = str(tmp_path / 'training_data')
    mel_dir, lin_dir, wav_dir = [os.path.join(out, d) for d in ('mels', 'linear', 'audio')]
    for d in (mel_dir, lin_dir, wav_dir):
        os.makedirs(d)
    meta = preprocessor.build_from_path(hp, [corpus], mel_dir, lin_dir, wav_dir, n_jobs=2)
    assert len(meta) == 3
    hop = hp.get_hop_size()
    for (audio_f, mel_f, lin_f, time_steps, mel_frames, text) in meta:
        audio_arr = np.load(os.path.join(wav_dir, audio_f))
        mel = np.load(os.path.join(mel_dir, mel_f))
        lin = np.load(os.path.join(lin_dir, lin_f))
        # hop alignment invariant (WaveNet upsampling depends on it)
        assert len(audio_arr) == mel_frames * hop == time_steps
        assert mel.shape == (mel_frames, hp.num_mels)
        assert lin.shape == (mel_frames, hp.num_freq)
        assert text.startswith('Normalized text')
        assert np.abs(mel).max() <= hp.max_abs_value + 1e-6


def test_build_from_path_wavenet(tmp_path, corpus, hp):
    out = str(tmp_path / 'wn_data')
    mel_dir, wav_dir = os.path.join(out, 'mels'), os.path.join(out, 'audio')
    os.makedirs(mel_dir); os.makedirs(wav_dir)
    meta = preprocessor.build_from_path_wavenet(hp, os.path.join(corpus, 'wavs'), mel_dir, wav_dir, n_jobs=2)
    assert len(meta) == 3
    for (audio_f, mel_f, mel_f2, g, time_steps, mel_frames) in meta:
        assert g == '<no_g>'
        assert mel_f == mel_f2
        assert len(np.load(os.path.join(wav_dir, audio_f))) == mel_frames * hp.get_hop_size()


def test_mulaw_quantize_input_type(tmp_path, corpus, hp):
    hp.input_type = 'mulaw-quantize'
    hp.quantize_channels = 256
    hp.out_channels = 256
    out = str(tmp_path / 'training_data_mu')
    mel_dir, lin_dir, wav_dir = [os.path.join(out, d) for d in ('mels', 'linear', 'audio')]
    for d in (mel_dir, lin_dir, wav_dir):
        os.makedirs(d)
    meta = preprocessor.build_from_path(hp, [corpus], mel_dir, lin_dir, wav_dir, n_jobs=1)
    assert len(meta) == 3
    arr = np.load(os.path.join(wav_dir, meta[0][0]))
    assert arr.dtype == np.int16
    assert arr.min() >= 0 and arr.max() <= 255


def test_mailabs_tree_selection(tmp_path):
    """M-AILABS language/voice/reader/book tree walk (reference preprocess.py:45-76)."""
    from tacotron2_tpu.data import corpora
    base = tmp_path
    book_dir = base / 'en_US' / 'by_book' / 'female' / 'mary_ann' / 'northandsouth'
    book2_dir = base / 'en_US' / 'by_book' / 'female' / 'mary_ann' / 'bleak_house'
    book_dir.mkdir(parents=True)
    book2_dir.mkdir(parents=True)
    out = corpora.norm_data(str(base), 'M-AILABS', 'en_US', 'female', 'mary_ann',
                            False, 'northandsouth')
    assert out == [str(book_dir)]
    merged = corpora.norm_data(str(base), 'M-AILABS', 'en_US', 'female', 'mary_ann',
                               True)
    assert sorted(merged) == sorted([str(book_dir), str(book2_dir)])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpora.norm_data(str(base), 'M-AILABS', 'xx_XX', 'female', 'mary_ann')
    with _pytest.raises(ValueError):
        corpora.norm_data(str(base), 'M-AILABS', 'en_US', 'female', 'nobody')
