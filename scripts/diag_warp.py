#!/usr/bin/env python
"""Attribute free-run timing drift from the free↔GT DTW warp curve.

Reads the diag_mels_<tag>.npz dumped by eval_freerun_quality, DTW-aligns each
free-run mel to its ground-truth mel, and characterizes the warp path
j(i): overall slope (free frames per GT frame), local slope distribution over
33-frame (~0.4 s) windows, and the max cumulative offset in frames. Uniform
slope ≈ length_ratio with tight local slopes means a constant tempo error;
wide local slopes mean the decoder lingers/rushes per segment.

Usage: python scripts/diag_warp.py BASE_DIR TAG [N]
Prints one JSON line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.ops.mcd import mel_cepstra, dtw_path

    base, tag = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    hp = default_hparams().replace(predict_linear=False)
    npz = np.load(os.path.join(base, f'diag_mels_{tag}.npz'))
    mel_dir = os.path.join(base, 'training_data', 'mels')
    names = sorted({k.rsplit('.', 1)[0] for k in npz.files})[:n]

    rows = []
    for name in names:
        fm = npz[name + '.free']
        gt = np.load(os.path.join(mel_dir, name + '.npy'))
        ca, cb = mel_cepstra(fm, hp), mel_cepstra(gt, hp)
        d2 = (np.sum(ca * ca, 1)[:, None] + np.sum(cb * cb, 1)[None, :]
              - 2.0 * ca @ cb.T)
        _, path = dtw_path(np.sqrt(np.maximum(d2, 0.0)))
        i, j = path[:, 0].astype(np.float64), path[:, 1].astype(np.float64)
        # j = GT index as a function of free index i: slope < 1 => free is slower
        W = 33
        slopes = []
        for lo in range(0, len(path) - W, W // 2):
            di = i[lo + W] - i[lo]
            dj = j[lo + W] - j[lo]
            if di > 0:
                slopes.append(dj / di)
        slopes = np.asarray(slopes) if slopes else np.asarray([np.nan])
        offset = i - j * (len(fm) - 1) / max(1, len(gt) - 1)
        rows.append(dict(
            name=name, free_frames=int(len(fm)), gt_frames=int(len(gt)),
            overall_slope=round(float(len(gt) / len(fm)), 3),
            local_slope_p10=round(float(np.nanpercentile(slopes, 10)), 3),
            local_slope_p50=round(float(np.nanpercentile(slopes, 50)), 3),
            local_slope_p90=round(float(np.nanpercentile(slopes, 90)), 3),
            max_abs_offset_frames=round(float(np.abs(offset).max()), 1)))

    agg = lambda k: round(float(np.mean([r[k] for r in rows])), 3)  # noqa: E731
    print(json.dumps(dict(
        n=len(rows), tag=tag,
        overall_slope_mean=agg('overall_slope'),
        local_slope_p10_mean=agg('local_slope_p10'),
        local_slope_p90_mean=agg('local_slope_p90'),
        max_abs_offset_frames_mean=agg('max_abs_offset_frames'),
        per_utterance=rows)))


if __name__ == '__main__':
    main()
