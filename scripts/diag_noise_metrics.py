#!/usr/bin/env python
"""Diagnose the noise-corpus free-run quality metrics (round 4).

The r=2 45k free-run eval scored centroid_r_free ~0.34 and mcd_free_vs_gta ~82
while GTA scored 0.9995 / 8.1. Two metric artifacts could produce exactly this
without the synthesis being wrong:

  A. MCD realization floor: band-noise is sample-level random. GTA predicts the
     *exact* GT realization only because 50 ms analysis windows at 12.5 ms hop
     overlap 75% (teacher frames leak the realization). A free-running model can
     at best emit a DIFFERENT realization of the correct band sequence. This
     experiment measures MCD-DTW between the GT mel and a fresh same-text
     realization (a perfect free-running generator) — the floor any free-run
     MCD must be compared against.

  B. centroid_r timing sensitivity: the metric assumes character i occupies
     wav window [i*90ms, (i+1)*90ms) exactly. A free-run model with correct
     content but a few percent of cumulative duration drift desyncs late
     windows from their characters. This experiment time-warps GROUND-TRUTH
     audio per character segment and reports centroid_r vs drift magnitude.

Pure numpy/CPU (no chip needed). Usage:
  python scripts/diag_noise_metrics.py BASE_DIR [N]
Prints one JSON line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, '/root/repo')
sys.path.insert(0, os.path.dirname(__file__))

from make_synth_corpus import noise_for  # noqa: E402
from eval_freerun_quality import _centroid_r  # noqa: E402


def _warp(wav: np.ndarray, sr: int, char_ms: float, bias: float, jitter: float,
          rng: np.random.Generator) -> np.ndarray:
    """Resample each 90 ms character segment to (1 + bias + U(-jitter, jitter))
    of its duration — correct content, drifting timing."""
    n = int(sr * char_ms / 1000)
    out = []
    for lo in range(0, len(wav) - n + 1, n):
        seg = wav[lo:lo + n]
        scale = 1.0 + bias + rng.uniform(-jitter, jitter)
        m = max(8, int(round(n * scale)))
        x_old = np.linspace(0.0, 1.0, len(seg))
        x_new = np.linspace(0.0, 1.0, m)
        out.append(np.interp(x_new, x_old, seg).astype(np.float32))
    return np.concatenate(out) if out else wav


def main():
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.data.loader import TacotronDataset
    from tacotron2_tpu.ops import audio
    from tacotron2_tpu.ops.mcd import mcd_dtw

    base = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hp = default_hparams().replace(predict_linear=False)
    ds = TacotronDataset(os.path.join(base, 'training_data', 'train.txt'), hp)
    rows = ds._test_meta[:n]
    mel_dir = os.path.join(base, 'training_data', 'mels')
    wav_dir = os.path.join(base, 'LJSpeech-1.1', 'wavs')

    from tacotron2_tpu.ops.mcd import centroid_corr_dtw

    rng = np.random.default_rng(777)
    floor_mcd, fresh_r, warp_r = [], [], {}
    dtw_warp, dtw_fresh, dtw_mismatch = [], [], []
    gt_mels = []
    warp_settings = [(0.0, 0.0), (0.028, 0.0), (0.0, 0.05), (0.028, 0.05),
                     (0.0, 0.10)]
    for m in rows:
        name, text = m[1].replace('.npy', '').replace('mel-', ''), m[5]
        gt_mel = np.load(os.path.join(mel_dir, m[1]))
        from scipy.io import wavfile
        sr, wav16 = wavfile.read(os.path.join(wav_dir, name + '.wav'))
        wav = wav16.astype(np.float32) / 32767.0

        # A: fresh realization of the same text -> mel -> MCD vs GT mel
        fresh = np.concatenate([noise_for(c, rng) for c in text])
        fr_wav = audio.preemphasis(fresh, hp.preemphasis, hp.preemphasize)
        fr_mel = audio.melspectrogram(fr_wav, hp).astype(np.float32).T
        floor_mcd.append(mcd_dtw(fr_mel, gt_mel, hp))
        r, _ = _centroid_r(fresh, text, sr, 300.0, 55.0)
        fresh_r.append(r)
        gt_mels.append(gt_mel)

        # C: validate the DTW-aligned mel-centroid metric (ops/mcd.py):
        # fresh realization (right content) -> ~1; warped GT -> ~1
        dtw_fresh.append(centroid_corr_dtw(fr_mel, gt_mel, hp))
        w = _warp(wav, sr, 90.0, 0.028, 0.05, rng)
        w_wav = audio.preemphasis(w, hp.preemphasis, hp.preemphasize)
        w_mel = audio.melspectrogram(w_wav, hp).astype(np.float32).T
        dtw_warp.append(centroid_corr_dtw(w_mel, gt_mel, hp))

        # B: time-warped ground truth -> centroid_r
        for bias, jit in warp_settings:
            w = _warp(wav, sr, 90.0, bias, jit, rng)
            r, _ = _centroid_r(w, text, sr, 300.0, 55.0)
            warp_r.setdefault(f'bias={bias:+.3f},jitter={jit:.2f}', []).append(r)

    # C (negative control): DTW metric across MISMATCHED utterances must be low
    for k in range(len(gt_mels)):
        dtw_mismatch.append(centroid_corr_dtw(
            gt_mels[k], gt_mels[(k + 1) % len(gt_mels)], hp))

    def s(v):
        v = np.asarray(v, np.float64)
        v = v[np.isfinite(v)]
        return dict(mean=round(float(v.mean()), 4), p50=round(float(np.median(v)), 4))

    print(json.dumps(dict(
        n=len(rows),
        mcd_fresh_realization_vs_gt=s(floor_mcd),
        centroid_r_fresh_realization=s(fresh_r),
        centroid_r_warped_gt={k: s(v) for k, v in warp_r.items()},
        centroid_r_dtw_fresh=s(dtw_fresh),
        centroid_r_dtw_warped_gt=s(dtw_warp),
        centroid_r_dtw_mismatched_control=s(dtw_mismatch),
    )))


if __name__ == '__main__':
    main()
