#!/usr/bin/env python
"""Score end-to-end text->WAV synthesis quality (audio domain, not mel domain).

eval_freerun_quality.py scores the Tacotron mel (its wav is a Griffin-Lim
inversion of the model output); this script scores the actual WaveNet-vocoded
waveform the reference ships as its deliverable (reference
wavenet_vocoder/synthesize.py:12-66): each synthesized wav is re-analyzed with
the standard wav->mel chain (ops/audio.melspectrogram — the same features the
GT mels were extracted with), then compared to the ground-truth mel of the
same held-out utterance:

  - audio_centroid_r_dtw_free_vs_gt: timing-marginalized conditioning score
    (ops/mcd.centroid_corr_dtw) between re-extracted and GT mels — the metric
    validated with controls in docs/round4/RESULTS.md §1b (perfect-generator
    ceiling 0.987 on band-noise corpora, mismatched-text floor 0.55),
  - audio_mcd_free_vs_gt: MCD-DTW (band-noise floor 48 dB for a perfect
    generator, RESULTS §1b — read against that, not against 0),
  - audio_centroid_r_free: fixed-window per-character spectral-centroid r on
    the raw wav (scripts/eval_noiseband.py metric; timing-brittle, secondary),
  - audio_length_ratio_free_vs_gt: synthesized vs ground-truth duration.

Usage:
  python scripts/eval_wav_quality.py WAV_MAP BASE_DIR [N] [HPARAMS] [MODE] [TAG]

WAV_MAP: the WaveNet synthesizer's output map.txt (rows `text|mel|wav`,
inference/wavenet_synthesizer.py run_synthesis). Rows are matched to the
loader's deterministic held-out test split of BASE_DIR by text (the same split
eval_freerun_quality evaluates). MODE: noise (default) or tone. Prints one
JSON line (make_quality_manifest.py-compatible).
"""

import json
import os
import sys

import numpy as np


def _fixed_window_centroid_r(wav, text, sr, f0, df):
    """Per-character spectral-centroid Pearson r (eval_noiseband.py metric)."""
    n_char = int(sr * 0.09)
    exp, got = [], []
    for i, ch in enumerate(text):
        if not ch.isalpha():
            continue
        lo = i * n_char
        if lo + n_char > len(wav):
            break
        x = wav[lo:lo + n_char]
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        freqs = np.fft.rfftfreq(len(x), 1 / sr)
        keep = freqs > 120
        s = spec[keep]
        if s.sum() < 1e-9:
            continue
        got.append(float((freqs[keep] * s).sum() / s.sum()))
        exp.append(f0 + df * (ord(ch) - ord('a')))
    if len(exp) < 3:
        return float('nan')
    return float(np.corrcoef(np.asarray(exp), np.asarray(got))[0, 1])


def main():
    sys.path.insert(0, '/root/repo')
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    from scipy.io import wavfile

    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.data.loader import TacotronDataset
    from tacotron2_tpu.ops import audio
    from tacotron2_tpu.ops.mcd import centroid_corr_dtw, mcd_dtw

    wav_map, base_dir = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    hp = default_hparams()
    if len(sys.argv) > 4 and sys.argv[4]:
        hp.parse(sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else 'noise'
    f0, df = (300.0, 55.0) if mode == 'noise' else (180.0, 24.0)

    # held-out rows keyed by text (same deterministic split as training eval)
    ds = TacotronDataset(os.path.join(base_dir, 'training_data', 'train.txt'), hp)
    mel_dir = os.path.join(base_dir, 'training_data', 'mels')
    by_text = {m[5]: os.path.join(mel_dir, m[1]) for m in ds._test_meta[:n]}

    per_utt = []
    for line in open(wav_map, encoding='utf-8'):
        text, _, wav_path = line.rstrip('\n').split('|')
        if text not in by_text:
            continue
        gt = np.load(by_text[text])  # (T, num_mels)
        sr, wav = wavfile.read(wav_path)
        if wav.dtype.kind == 'i':
            wav = wav.astype(np.float32) / np.iinfo(wav.dtype).max
        assert sr == hp.sample_rate, (sr, hp.sample_rate)
        # GT-chain re-extraction: stored mels are melspectrogram(preemphasized +
        # own-max-rescaled wav) (data/preprocessor.py:71-76) — melspectrogram
        # itself does NOT preemphasize. Validated on GT audio: this chain gives
        # r_dtw 1.0 / MCD 0.1-0.6 (ceiling), vs r 0.97 / MCD ~27 without the
        # preemphasis (docs/round5/RESULTS.md §3 controls).
        w = audio.preemphasis(wav, hp.preemphasis, hp.preemphasize)
        if hp.rescale:
            w = w / np.abs(w).max() * hp.rescaling_max
        mel = audio.melspectrogram(w, hp).T  # wav -> (T, num_mels)
        per_utt.append(dict(
            text=text, wav=wav_path,
            wav_frames=int(len(mel)), gt_frames=int(len(gt)),
            audio_centroid_r_free=round(
                _fixed_window_centroid_r(wav, text, sr, f0, df), 4),
            audio_centroid_r_dtw_free_vs_gt=round(
                centroid_corr_dtw(mel, gt, hp), 4),
            audio_mcd_free_vs_gt=round(mcd_dtw(mel, gt, hp), 3)))

    def stats(key):
        v = np.asarray([u[key] for u in per_utt], np.float64)
        v = v[np.isfinite(v)]
        if not len(v):
            return None
        return dict(mean=round(float(v.mean()), 4),
                    p50=round(float(np.median(v)), 4),
                    p90=round(float(np.percentile(v, 90)), 4))

    print(json.dumps(dict(
        n=len(per_utt), checkpoint=wav_map, corpus=base_dir, mode='wav-' + mode,
        audio_centroid_r_free=stats('audio_centroid_r_free'),
        audio_centroid_r_dtw_free_vs_gt=stats('audio_centroid_r_dtw_free_vs_gt'),
        audio_mcd_free_vs_gt=stats('audio_mcd_free_vs_gt'),
        audio_length_ratio_free_vs_gt=per_utt and round(float(np.mean(
            [u['wav_frames'] / u['gt_frames'] for u in per_utt])), 3),
        per_utterance=per_utt)))


if __name__ == '__main__':
    main()
