#!/usr/bin/env python
"""Free-running synthesis quality on a synthetic corpus, end to end.

For N held-out utterances (the loader's deterministic test split): free-run
synthesis from text, GTA synthesis from the ground-truth mel, then
  - MCD-DTW free-vs-GTA / free-vs-GT / GTA-vs-GT (ops/mcd.py),
  - stop-token recovered lengths vs ground-truth frames,
  - for noise/tone corpora: per-character spectral-centroid Pearson r of the
    Griffin-Lim inversion vs the band each character encodes (the round-2/3
    conditioning proof, scripts/eval_noiseband.py), for BOTH the free-run and
    the GTA wav — GTA centroid-r is the teacher-forced ceiling.

Usage:
  python scripts/eval_freerun_quality.py CKPT_DIR BASE_DIR [N] [HPARAMS] [MODE]
MODE: noise (default) or tone — sets the expected band center per character.
Prints one JSON line.
"""

import json
import os
import sys

import numpy as np


def _centroid_r(wav: np.ndarray, text: str, sr: int, f0: float, df: float):
    """Pearson r between measured 90 ms-window centroids and expected centers."""
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
        return float('nan'), len(exp)
    return float(np.corrcoef(np.asarray(exp), np.asarray(got))[0, 1]), len(exp)


def main():
    sys.path.insert(0, '/root/repo')
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.data.loader import TacotronDataset
    from tacotron2_tpu.inference.tacotron_synthesizer import Synthesizer
    from tacotron2_tpu.ops import audio
    from tacotron2_tpu.ops.mcd import mcd_dtw

    ckpt_dir = sys.argv[1]
    base_dir = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    hp = default_hparams()
    if len(sys.argv) > 4 and sys.argv[4]:
        hp.parse(sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else 'noise'
    f0, df = (300.0, 55.0) if mode == 'noise' else (180.0, 24.0)
    # numpy Griffin-Lim: per-utterance mel lengths vary, so the jit GL would
    # compile one program per length through the slow remote-compile service
    hp = hp.replace(GL_on_GPU=False)

    meta_path = os.path.join(base_dir, 'training_data', 'train.txt')
    ds = TacotronDataset(meta_path, hp)
    rows = ds._test_meta[:n]
    texts = [m[5] for m in rows]
    mel_dir = os.path.join(base_dir, 'training_data', 'mels')
    gt_paths = [os.path.join(mel_dir, m[1]) for m in rows]
    names = [m[1].replace('.npy', '') for m in rows]

    free_synth = Synthesizer()
    free_synth.load(ckpt_dir, hp)
    free_mels = free_synth.synthesize(texts, names, None, None, None)
    gta_synth = Synthesizer()
    gta_synth.load(ckpt_dir, hp, gta=True)
    gta_mels = gta_synth.synthesize(texts, names, None, None, gt_paths)

    from tacotron2_tpu.ops.mcd import centroid_corr_dtw

    dump = {}
    per_utt = []
    for name, text, fm, gm, gtp in zip(names, texts, free_mels, gta_mels, gt_paths):
        gt = np.load(gtp)
        dump[name + '.free'] = fm
        dump[name + '.gta'] = gm
        free_wav = audio.inv_mel_spectrogram(fm.T, hp)
        free_wav = audio.inv_preemphasis(free_wav, hp.preemphasis, hp.preemphasize)
        gta_wav = audio.inv_mel_spectrogram(gm.T, hp)
        gta_wav = audio.inv_preemphasis(gta_wav, hp.preemphasis, hp.preemphasize)
        r_free, nw = _centroid_r(free_wav, text, hp.sample_rate, f0, df)
        r_gta, _ = _centroid_r(gta_wav, text, hp.sample_rate, f0, df)
        per_utt.append(dict(
            name=name, text=text,
            free_frames=int(len(fm)), gt_frames=int(len(gt)),
            centroid_r_free=round(r_free, 4), centroid_r_gta=round(r_gta, 4),
            # timing-marginalized conditioning score (ops/mcd.centroid_corr_dtw):
            # the fixed-window metric above conflates duration drift with content
            centroid_r_dtw_free_vs_gt=round(centroid_corr_dtw(fm, gt, hp), 4),
            n_char_windows=nw,
            mcd_free_vs_gta=round(mcd_dtw(fm, gm, hp), 3),
            mcd_free_vs_gt=round(mcd_dtw(fm, gt, hp), 3),
            mcd_gta_vs_gt=round(mcd_dtw(gm, gt, hp), 3)))
    tag = sys.argv[6] if len(sys.argv) > 6 else \
        os.path.basename(os.path.dirname(ckpt_dir.rstrip('/')))
    np.savez_compressed(os.path.join(base_dir, f'diag_mels_{tag}.npz'), **dump)

    def stats(key):
        v = np.asarray([u[key] for u in per_utt], np.float64)
        v = v[np.isfinite(v)]
        if not len(v):
            return None
        return dict(mean=round(float(v.mean()), 4), p50=round(float(np.median(v)), 4),
                    p90=round(float(np.percentile(v, 90)), 4))

    print(json.dumps(dict(
        n=len(per_utt), checkpoint=ckpt_dir, corpus=base_dir, mode=mode,
        centroid_r_free=stats('centroid_r_free'),
        centroid_r_gta=stats('centroid_r_gta'),
        centroid_r_dtw_free_vs_gt=stats('centroid_r_dtw_free_vs_gt'),
        mcd_free_vs_gta=stats('mcd_free_vs_gta'),
        mcd_free_vs_gt=stats('mcd_free_vs_gt'),
        mcd_gta_vs_gt=stats('mcd_gta_vs_gt'),
        length_ratio_free_vs_gt=stats('free_frames') and round(float(np.mean(
            [u['free_frames'] / u['gt_frames'] for u in per_utt])), 3),
        per_utterance=per_utt)))


if __name__ == '__main__':
    main()
