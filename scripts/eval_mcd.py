#!/usr/bin/env python
"""Objective synthesis-quality regression metric: MCD-DTW between free-running
synthesis, GTA (teacher-forced) synthesis, and ground-truth mels on held-out
utterances (the loader's deterministic test split — text the model never
trained on).

The reference has no numeric quality metric (README links audio samples by ear);
this closes that gap for the zero-egress synthetic corpora: mcd_free_vs_gta
measures what free-running autoregression loses vs teacher forcing, and
mcd_gta_vs_gt is the teacher-forced floor.

Usage:
  python scripts/eval_mcd.py CKPT_DIR BASE_DIR [N] [HPARAMS]
CKPT_DIR: taco_pretrained checkpoint dir; BASE_DIR: corpus dir holding
training_data/; N: held-out utterances (default 16); HPARAMS: 'k=v,...'
overrides (must match training, e.g. outputs_per_step).
Prints one JSON line with mean/percentile MCDs and per-utterance rows.
"""

import json
import os
import sys

import numpy as np


def main():
    sys.path.insert(0, '/root/repo')
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.data.loader import TacotronDataset
    from tacotron2_tpu.inference.tacotron_synthesizer import Synthesizer
    from tacotron2_tpu.ops.mcd import mcd_dtw

    ckpt_dir = sys.argv[1]
    base_dir = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    hp = default_hparams()
    if len(sys.argv) > 4:
        hp.parse(sys.argv[4])

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

    per_utt = []
    for name, text, fm, gm, gtp in zip(names, texts, free_mels, gta_mels, gt_paths):
        gt = np.load(gtp)
        per_utt.append(dict(
            name=name, text=text,
            free_frames=int(len(fm)), gt_frames=int(len(gt)),
            mcd_free_vs_gta=round(mcd_dtw(fm, gm, hp), 3),
            mcd_free_vs_gt=round(mcd_dtw(fm, gt, hp), 3),
            mcd_gta_vs_gt=round(mcd_dtw(gm, gt, hp), 3)))

    def stats(key):
        v = np.asarray([u[key] for u in per_utt])
        return dict(mean=round(float(v.mean()), 3), p50=round(float(np.median(v)), 3),
                    p90=round(float(np.percentile(v, 90)), 3))

    print(json.dumps(dict(
        n=len(per_utt), checkpoint=ckpt_dir,
        mcd_free_vs_gta=stats('mcd_free_vs_gta'),
        mcd_free_vs_gt=stats('mcd_free_vs_gt'),
        mcd_gta_vs_gt=stats('mcd_gta_vs_gt'),
        length_ratio_free_vs_gt=round(float(np.mean(
            [u['free_frames'] / u['gt_frames'] for u in per_utt])), 3),
        per_utterance=per_utt)))


if __name__ == '__main__':
    main()
