"""Tests for the quality-measurement tooling (the round-5 audio-domain loop).

Two regressions these guard against, both found the hard way:

- scripts/eval_wav_quality.py re-extracts mels from synthesized wavs and must
  reproduce the preprocessor's stored-mel chain EXACTLY (preemphasize ->
  own-max rescale -> melspectrogram, data/preprocessor.py _prepare_audio /
  _process_utterance). The first draft of the scorer omitted the preemphasis
  and silently capped the ground-truth ceiling at r 0.97 / MCD ~27 instead of
  r 1.000 / MCD 0.1-0.6 (docs/round5/RESULTS.md §3, metric-chain validation).
- scripts/make_quality_manifest.py collates eval JSONs into docs/QUALITY.json,
  which bench.py reads into extras every round; round 4 shipped zero quality
  keys because the manifest was never generated (VERDICT r04 missing #2), so
  the collation rules (merge mel+audio evals of one corpus, tolerate log-line
  prefixes, keep only KEEP keys) need pinning.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    path = os.path.join(REPO, 'scripts', name + '.py')
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# eval_wav_quality's re-extraction chain == preprocessor's stored-mel chain
# ---------------------------------------------------------------------------

def test_wav_reextraction_matches_stored_mel(tmp_path):
    from scipy.io import wavfile

    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.data.preprocessor import _process_utterance
    from tacotron2_tpu.ops import audio
    from tacotron2_tpu.ops.mcd import centroid_corr_dtw

    hp = default_hparams()
    # raw input type: keep _prepare_audio from mu-law silence-cropping the
    # ends (band noise has none, but the test should not depend on that)
    hp.parse("input_type='raw',trim_silence=False")

    rng = np.random.default_rng(0)
    sr = hp.sample_rate
    t = np.arange(int(0.6 * sr)) / sr
    # band-limited noise + a tone, like the synthetic corpus
    wav = (0.4 * np.sin(2 * np.pi * 440.0 * t)
           + 0.2 * rng.standard_normal(t.shape)).astype(np.float32)
    wav /= np.abs(wav).max() * 1.1
    wav_path = tmp_path / 'utt.wav'
    wavfile.write(wav_path, sr, (wav * 32767).astype(np.int16))

    for d in ('mels', 'linear', 'audio'):
        os.makedirs(tmp_path / d, exist_ok=True)
    out = _process_utterance(str(tmp_path / 'mels'), str(tmp_path / 'linear'),
                             str(tmp_path / 'audio'), 'T1', str(wav_path),
                             'test utterance', hp)
    assert out is not None
    stored = np.load(tmp_path / 'mels' / 'mel-T1.npy')  # (T, num_mels)

    # the scorer's chain (scripts/eval_wav_quality.py main loop)
    sr2, w = wavfile.read(wav_path)
    assert sr2 == sr
    w = w.astype(np.float32) / np.iinfo(np.int16).max
    w = audio.preemphasis(w, hp.preemphasis, hp.preemphasize)
    if hp.rescale:
        w = w / np.abs(w).max() * hp.rescaling_max
    reex = audio.melspectrogram(w, hp).T

    assert reex.shape == stored.shape
    assert float(np.abs(reex - stored).max()) < 1e-3
    # and the operative quality metric sits at its ceiling
    assert centroid_corr_dtw(reex, stored, hp) > 0.999


def test_reextraction_without_preemphasis_is_detectably_wrong(tmp_path):
    """The exact round-5 scorer bug: drop the preemphasis and the 'ceiling'
    silently degrades — keep the two chains from drifting apart again."""
    from scipy.io import wavfile

    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.ops import audio

    hp = default_hparams()
    rng = np.random.default_rng(1)
    sr = hp.sample_rate
    wav = rng.standard_normal(int(0.5 * sr)).astype(np.float32) * 0.3
    wav_path = tmp_path / 'utt.wav'
    wavfile.write(wav_path, sr, (wav * 32767).astype(np.int16))
    _, w = wavfile.read(wav_path)
    w = w.astype(np.float32) / np.iinfo(np.int16).max

    good = audio.preemphasis(w, hp.preemphasis, hp.preemphasize)
    good = good / np.abs(good).max() * hp.rescaling_max
    good_mel = audio.melspectrogram(good, hp).T

    bad = w / np.abs(w).max() * hp.rescaling_max  # no preemphasis
    bad_mel = audio.melspectrogram(bad, hp).T

    assert float(np.abs(good_mel - bad_mel).max()) > 1.0


# ---------------------------------------------------------------------------
# make_quality_manifest collation
# ---------------------------------------------------------------------------

def _eval_json(**kw):
    base = dict(n=16, checkpoint='/tmp/x', corpus='/tmp/c', mode='noise')
    base.update(kw)
    return base


def test_manifest_merges_mel_and_audio_evals(tmp_path, monkeypatch, capsys):
    mod = _load_script('make_quality_manifest')

    mel = _eval_json(centroid_r_dtw_free_vs_gt={'mean': 0.92},
                     mcd_free_vs_gt={'mean': 50.0},
                     per_utterance=[{'dropped': 'yes'}])
    wav = _eval_json(mode='wav-noise',
                     audio_centroid_r_dtw_free_vs_gt={'mean': 0.77},
                     audio_mcd_free_vs_gt={'mean': 112.0})
    p_mel = tmp_path / 'mel.json'
    p_wav = tmp_path / 'wav.json'
    p_mel.write_text(json.dumps(mel))
    # the synthesizer logs lines before the JSON — parsing must skip them
    p_wav.write_text('Loaded WaveNet checkpoint at step 10000\n'
                     + json.dumps(wav))
    out = tmp_path / 'QUALITY.json'

    monkeypatch.setattr(sys, 'argv', [
        'make_quality_manifest.py', str(out), '2026-08-19',
        f'noise_ss={p_mel}', f'noise_ss={p_wav}'])
    mod.main()
    capsys.readouterr()

    man = json.loads(out.read_text())
    rec = man['corpora']['noise_ss']
    # merged: both domains under one corpus key
    assert rec['centroid_r_dtw_free_vs_gt']['mean'] == 0.92
    assert rec['audio_centroid_r_dtw_free_vs_gt']['mean'] == 0.77
    # per_utterance and other non-KEEP keys are dropped
    assert 'per_utterance' not in rec and 'n' not in rec
    # provenance of the merged-in file is kept under 'also'
    assert rec['provenance']['source'] == str(p_mel)
    assert rec['provenance']['also'][0]['source'] == str(p_wav)
    assert rec['provenance']['also'][0]['mode'] == 'wav-noise'


def test_bench_reads_only_keys_the_manifest_emits():
    """Every quality key bench.py forwards as an extra must be one the
    manifest generator KEEPs — otherwise bench would silently report nothing
    for it (bench deliberately forwards a primary-metric subset, so the
    containment goes this way, not the reverse)."""
    import re
    mod = _load_script('make_quality_manifest')
    bench_src = open(os.path.join(REPO, 'bench.py'), encoding='utf-8').read()
    bench_keys = set(re.findall(
        r"'((?:audio_)?(?:mcd|centroid_r|length_ratio)[a-z_]*)'", bench_src))
    assert bench_keys, 'bench.py quality-extras key list not found'
    missing = sorted(bench_keys - set(mod.KEEP))
    assert not missing, f'bench.py reads keys the manifest never emits: {missing}'
