#!/usr/bin/env python
"""Collate eval_freerun_quality JSON outputs into docs/round4/QUALITY.json.

bench.py reads the manifest (T2_QUALITY_JSON) and reports the recorded
synthesis-quality metrics as bench extras every round — quality needs a
trained checkpoint + corpus that a bench run on random weights cannot
produce, so the manifest records the most recent measured run with full
provenance (checkpoint path, corpus, n, date passed by the caller).

Usage:
  python scripts/make_quality_manifest.py OUT.json DATE corpus=path.json ...
e.g.
  python scripts/make_quality_manifest.py docs/round4/QUALITY.json 2026-08-19 \
      noise_r2=/tmp/soak4/quality_r2b.json tone_r1=/tmp/tone4/quality_r1.json
Each input may have log lines before the JSON (eval_freerun_quality prints
synthesizer load logs to stdout); parsing starts at the first '{"'.
"""

import json
import sys

KEEP = ('mcd_free_vs_gta', 'mcd_free_vs_gt', 'mcd_gta_vs_gt',
        'centroid_r_dtw_free_vs_gt', 'centroid_r_free', 'centroid_r_gta',
        'length_ratio_free_vs_gt',
        # audio-domain keys (scripts/eval_wav_quality.py — WaveNet-vocoded wav)
        'audio_centroid_r_free', 'audio_centroid_r_dtw_free_vs_gt',
        'audio_mcd_free_vs_gt', 'audio_length_ratio_free_vs_gt')


def load_quality(path: str) -> dict:
    raw = open(path, encoding='utf-8').read()
    try:  # clean (possibly pretty-printed) JSON file
        return json.loads(raw)
    except json.JSONDecodeError:  # synthesizer load logs precede the JSON line
        return json.loads(raw[raw.index('{"'):])


def main():
    out_path, date = sys.argv[1], sys.argv[2]
    corpora = {}
    for spec in sys.argv[3:]:
        corpus, path = spec.split('=', 1)
        q = load_quality(path)
        rec = {k: q[k] for k in KEEP if q.get(k) is not None}
        rec['provenance'] = dict(
            checkpoint=q['checkpoint'], corpus=q['corpus'], n=q['n'],
            mode=q['mode'], source=path, date=date)
        if corpus in corpora:  # merge (e.g. mel-domain + audio-domain evals)
            prov = corpora[corpus].pop('provenance')
            prov['also'] = prov.get('also', []) + [rec.pop('provenance')]
            corpora[corpus].update(rec)
            corpora[corpus]['provenance'] = prov
        else:
            corpora[corpus] = rec
    with open(out_path, 'w', encoding='utf-8') as f:
        json.dump(dict(
            comment='Recorded synthesis-quality metrics (scripts/'
                    'eval_freerun_quality.py); consumed by bench.py extras.',
            corpora=corpora), f, indent=1)
    print(f'wrote {out_path}: {sorted(corpora)}')


if __name__ == '__main__':
    main()
