#!/usr/bin/env python
"""Generate a synthetic char→tone corpus in LJSpeech layout.

Each character a-z deterministically maps to a 90 ms pure tone (180 Hz + 24 Hz
per letter index, with a soft attack/decay envelope); spaces are 90 ms of
silence. The 24 Hz spacing keeps adjacent letters >1 mel-bin apart at the
default 80-mel analysis, so the learned char->tone mapping is verifiable from
synthesized audio (6 Hz spacing trains but is unmeasurable and gives attention
a much weaker discrimination signal). A Tacotron trained on this must learn a monotonic character↔frame
alignment and utterance-length stop tokens, making it a fast hardware
validation corpus when LJSpeech is unavailable (zero-egress box).

Usage: python scripts/make_synth_corpus.py OUT_DIR [n_utterances]
Writes OUT_DIR/LJSpeech-1.1/{wavs/*.wav, metadata.csv}.
"""

import os
import sys

import numpy as np
from scipy.io import wavfile

SR = 22050
CHAR_MS = 90
WORDS = ('tone scale audio signal vocoder mel frame align decode spectra '
         'wave pitch tempo chirp note chord organ flute viola cello').split()


def tone_for(ch: str) -> np.ndarray:
    n = int(SR * CHAR_MS / 1000)
    if not ch.isalpha():
        return np.zeros(n, np.float32)
    f = 180.0 + 24.0 * (ord(ch) - ord('a'))
    t = np.arange(n) / SR
    env = np.minimum(1.0, np.minimum(t / 0.01, (n / SR - t) / 0.01))
    return (0.45 * np.sin(2 * np.pi * f * t) * env).astype(np.float32)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else '.'
    n_utt = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    root = os.path.join(out, 'LJSpeech-1.1')
    os.makedirs(os.path.join(root, 'wavs'), exist_ok=True)
    rng = np.random.default_rng(1234)
    rows = []
    for i in range(n_utt):
        words = [WORDS[j] for j in rng.integers(0, len(WORDS), rng.integers(2, 6))]
        text = ' '.join(words)
        wav = np.concatenate([tone_for(c) for c in text])
        name = f'SYN-{i:04d}'
        wavfile.write(os.path.join(root, 'wavs', name + '.wav'), SR,
                      (wav * 32767).astype(np.int16))
        rows.append(f'{name}|{text}|{text}')
    with open(os.path.join(root, 'metadata.csv'), 'w', encoding='utf-8') as f:
        f.write('\n'.join(rows) + '\n')
    print(f'wrote {n_utt} utterances to {root}')


if __name__ == '__main__':
    main()
