#!/usr/bin/env python
"""Measure streaming-TTS time-to-first-audio against a running serve.py.

Raw-socket HTTP/1.1 client: records wall time from the moment the request is
sent to (a) response headers, (b) the first body bytes containing audio past
the WAV header, and (c) every subsequent chunk — then reports sustained cadence
vs real time (audio-seconds delivered per wall-second).

Usage: python scripts/measure_ttfa.py "text to speak" [host] [port] [runs]
Prints one JSON line per run plus a summary line.
"""

import json
import socket
import sys
import time
from urllib.parse import quote

WAV_HEADER_BYTES = 44  # RIFF header (unknown-length streaming convention)


def one_request(text: str, host: str, port: int, fmt: str = 'wav'):
    sock = socket.create_connection((host, port), timeout=300)
    req = (f'GET /tts?text={quote(text)}&format={fmt} HTTP/1.1\r\n'
           f'Host: {host}\r\nConnection: close\r\n\r\n').encode()
    t0 = time.time()
    sock.sendall(req)

    buf = b''
    t_headers = None
    while b'\r\n\r\n' not in buf:
        buf += sock.recv(65536)
    t_headers = time.time() - t0
    head, body = buf.split(b'\r\n\r\n', 1)
    assert b'200' in head.split(b'\r\n')[0], head.split(b'\r\n')[0]
    chunked = b'chunked' in head.lower()

    # decode chunked-transfer framing incrementally, logging arrival times
    arrivals = []  # (t_rel, payload_bytes)
    payload = b''
    t_first_audio = None

    def note(data: bytes):
        nonlocal payload, t_first_audio
        if not data:
            return
        payload += data
        arrivals.append((time.time() - t0, len(data)))
        if t_first_audio is None and len(payload) > WAV_HEADER_BYTES:
            t_first_audio = arrivals[-1][0]

    if not chunked:
        note(body)
        while True:
            data = sock.recv(65536)
            if not data:
                break
            note(data)
    else:
        rest = body
        while True:
            while b'\r\n' not in rest:
                data = sock.recv(65536)
                if not data:
                    rest = None
                    break
                rest += data
            if rest is None:
                break
            size_line, rest = rest.split(b'\r\n', 1)
            size = int(size_line.split(b';')[0], 16)
            if size == 0:
                break
            while len(rest) < size + 2:
                data = sock.recv(65536)
                if not data:
                    break
                rest += data
            note(rest[:size])
            rest = rest[size + 2:]
    sock.close()

    audio_bytes = max(0, len(payload) - WAV_HEADER_BYTES)
    audio_seconds = audio_bytes / 2 / 22050  # pcm16 payload
    total = arrivals[-1][0] if arrivals else float('nan')
    return dict(
        ttfa_headers_s=round(t_headers, 4),
        ttfa_first_audio_s=round(t_first_audio, 4) if t_first_audio else None,
        total_wall_s=round(total, 4),
        audio_seconds=round(audio_seconds, 3),
        rtf=round(total / audio_seconds, 4) if audio_seconds else None,
        n_chunks=len(arrivals),
        chunk_arrivals_s=[round(t, 3) for t, _ in arrivals[:12]])


def main():
    text = sys.argv[1] if len(sys.argv) > 1 else \
        'the quick brown fox jumps over the lazy dog near the river bank'
    host = sys.argv[2] if len(sys.argv) > 2 else '127.0.0.1'
    port = int(sys.argv[3]) if len(sys.argv) > 3 else 8000
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    results = []
    for i in range(runs):
        r = one_request(text, host, port)
        results.append(r)
        print(json.dumps(r))
    best = min(r['ttfa_first_audio_s'] for r in results if r['ttfa_first_audio_s'])
    med = sorted(r['ttfa_first_audio_s'] for r in results)[len(results) // 2]
    print(json.dumps(dict(summary=True, runs=runs,
                          ttfa_first_audio_best_s=best,
                          ttfa_first_audio_median_s=med,
                          rtf_median=sorted(r['rtf'] for r in results)[runs // 2])))


if __name__ == '__main__':
    main()
