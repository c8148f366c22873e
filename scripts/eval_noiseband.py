#!/usr/bin/env python
"""Score a noise-band-corpus synthesis: per-character spectral centroid vs the
band each character encodes (make_synth_corpus noise mode: center 300 + 55*idx Hz,
90 ms per char).

Usage: python scripts/eval_noiseband.py WAV "text with only lowercase words"
Prints the Pearson r between measured window centroids and expected centers over
the alphabetic characters, plus mean relative error. End-to-end conditioning
proof: r near 1 means text → attention → mel → vocoder all carried the content.
"""

import sys

import numpy as np
from scipy.io import wavfile

SR_EXPECT = 22050
CHAR_SEC = 0.09


def centroid(x: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1 / sr)
    # ignore DC/rumble below the lowest band
    keep = freqs > 150
    s = spec[keep]
    if s.sum() < 1e-9:
        return float('nan')
    return float((freqs[keep] * s).sum() / s.sum())


def main():
    wav_path, text = sys.argv[1], sys.argv[2]
    sr, wav = wavfile.read(wav_path)
    if wav.dtype.kind == 'i':
        wav = wav.astype(np.float32) / np.iinfo(wav.dtype).max
    n_char = int(sr * CHAR_SEC)
    exp, got, chars = [], [], []
    for i, ch in enumerate(text):
        if not ch.isalpha():
            continue
        lo = i * n_char
        if lo + n_char > len(wav):
            break
        c = centroid(wav[lo:lo + n_char], sr)
        if np.isnan(c):
            continue
        exp.append(300.0 + 55.0 * (ord(ch) - ord('a')))
        got.append(c)
        chars.append(ch)
    exp, got = np.asarray(exp), np.asarray(got)
    r = float(np.corrcoef(exp, got)[0, 1]) if len(exp) > 2 else float('nan')
    rel = float(np.mean(np.abs(got - exp) / exp)) if len(exp) else float('nan')
    dur = len(wav) / sr
    print(f'{len(exp)} char windows over {dur:.2f}s: centroid r={r:.3f}, '
          f'mean |rel err|={rel:.1%}')
    for ch, e, g in list(zip(chars, exp, got))[:40]:
        print(f'  {ch}: expected {e:6.0f} Hz, measured {g:6.0f} Hz')


if __name__ == '__main__':
    main()
