#!/usr/bin/env python
"""Generate a synthetic char→audio corpus in LJSpeech layout.

Two modes:

  tone  (default): each character a-z maps to a 90 ms pure tone (180 Hz + 24 Hz
        per letter index, soft attack/decay); spaces are 90 ms of silence. The
        24 Hz spacing keeps adjacent letters >1 mel-bin apart at the default
        80-mel analysis, so the learned char->tone mapping is verifiable from
        synthesized audio. Good for validating Tacotron (monotonic alignment,
        stop tokens) — but pure tones are sample-level self-predictable, so an
        autoregressive vocoder can reach low NLL while mostly ignoring its mel
        conditioning (it only needs c at character transitions).

  noise: each character maps to 90 ms of band-limited noise (center
        300 Hz + 55 Hz per letter index, ~90 Hz band — adjacent letters overlap
        by ~35 Hz, so verify with spectral centroids, not peak-picking). Noise
        is sample-level UNpredictable, so a WaveNet must read the mel
        conditioning to know the band — this mode validates vocoder
        conditioning, which the tone mode structurally cannot.

A Tacotron trained on either must learn a monotonic character↔frame alignment
and utterance-length stop tokens, making these fast hardware-validation corpora
when LJSpeech is unavailable (zero-egress box).

Usage: python scripts/make_synth_corpus.py OUT_DIR [n_utterances] [tone|noise]
           [min_words] [max_words]
Writes OUT_DIR/LJSpeech-1.1/{wavs/*.wav, metadata.csv}.

Utterance lengths: words are drawn uniform [min_words, max_words] (defaults 2, 5 —
the historical short-corpus behavior). When max_words > 12 a 10% long tail is drawn
from the upper half of the range so a multi-hour corpus spreads mel lengths across
many shape buckets and the longest utterances exceed max_mel_frames (900 frames =
11.2 s at hop 275), exercising the preprocessor's drop path.
"""

import os
import sys

import numpy as np
from scipy.io import wavfile

SR = 22050
CHAR_MS = 90
WORDS = ('tone scale audio signal vocoder mel frame align decode spectra '
         'wave pitch tempo chirp note chord organ flute viola cello').split()


def _envelope(n: int) -> np.ndarray:
    t = np.arange(n) / SR
    return np.minimum(1.0, np.minimum(t / 0.01, (n / SR - t) / 0.01))


def tone_for(ch: str) -> np.ndarray:
    n = int(SR * CHAR_MS / 1000)
    if not ch.isalpha():
        return np.zeros(n, np.float32)
    f = 180.0 + 24.0 * (ord(ch) - ord('a'))
    t = np.arange(n) / SR
    return (0.45 * np.sin(2 * np.pi * f * t) * _envelope(n)).astype(np.float32)


def noise_for(ch: str, rng: np.random.Generator) -> np.ndarray:
    n = int(SR * CHAR_MS / 1000)
    if not ch.isalpha():
        return np.zeros(n, np.float32)
    f = 300.0 + 55.0 * (ord(ch) - ord('a'))
    w = rng.normal(0, 1, n).astype(np.float32)
    spec = np.fft.rfft(w)
    freqs = np.fft.rfftfreq(n, 1 / SR)
    spec[(freqs < f - 45) | (freqs > f + 45)] = 0
    band = np.fft.irfft(spec, n).astype(np.float32)
    band /= max(1e-6, np.abs(band).max() / 0.45)
    return band * _envelope(n)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else '.'
    n_utt = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    mode = sys.argv[3] if len(sys.argv) > 3 else 'tone'
    min_words = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    max_words = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    assert mode in ('tone', 'noise'), mode
    root = os.path.join(out, 'LJSpeech-1.1')
    os.makedirs(os.path.join(root, 'wavs'), exist_ok=True)
    rng = np.random.default_rng(1234)
    rows = []
    total_sec = 0.0
    for i in range(n_utt):
        if max_words > 12 and rng.random() < 0.1:
            n_words = int(rng.integers((min_words + max_words) // 2, max_words + 1))
        else:
            n_words = int(rng.integers(min_words, min(max_words, 12) + 1))
        words = [WORDS[j] for j in rng.integers(0, len(WORDS), n_words)]
        text = ' '.join(words)
        if mode == 'tone':
            wav = np.concatenate([tone_for(c) for c in text])
        else:
            wav = np.concatenate([noise_for(c, rng) for c in text])
        total_sec += len(wav) / SR
        name = f'SYN-{i:05d}'
        wavfile.write(os.path.join(root, 'wavs', name + '.wav'), SR,
                      (wav * 32767).astype(np.int16))
        rows.append(f'{name}|{text}|{text}')
    with open(os.path.join(root, 'metadata.csv'), 'w', encoding='utf-8') as f:
        f.write('\n'.join(rows) + '\n')
    print(f'wrote {n_utt} {mode} utterances ({total_sec / 3600:.2f} h) to {root}')


if __name__ == '__main__':
    main()
