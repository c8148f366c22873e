"""Streaming TTS HTTP service: chunked delivery, formats, queueing."""

import http.client
import json
import struct
import threading
import time

import numpy as np
import pytest

from tacotron2_tpu.inference.server import (TTSServer, float_to_pcm16,
                                            wav_stream_header)

SR = 8000


def make_chunks(n=3, size=160):
    rng = np.random.default_rng(7)
    return [rng.uniform(-0.9, 0.9, size).astype(np.float32) for _ in range(n)]


@pytest.fixture()
def server():
    chunks = make_chunks()
    state = dict(in_flight=0, max_in_flight=0, started=threading.Event())

    def stream_fn(text, seed):
        state['in_flight'] += 1
        state['max_in_flight'] = max(state['max_in_flight'], state['in_flight'])
        state['started'].set()
        try:
            for c in chunks:
                time.sleep(0.01)  # emulate per-chunk generation latency
                yield c * (1.0 if seed == 0 else 0.5)
        finally:
            state['in_flight'] -= 1

    srv = TTSServer(stream_fn, sample_rate=SR, max_waiters=2).start()
    srv.chunks = chunks
    srv.state = state
    yield srv
    srv.close()


def get(srv, path, method='GET', body=None):
    conn = http.client.HTTPConnection(*srv.address, timeout=10)
    headers = {'Content-Type': 'application/json'} if body else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp, data


def test_healthz(server):
    resp, data = get(server, '/healthz')
    assert resp.status == 200
    obj = json.loads(data)
    assert obj['ok'] and obj['sample_rate'] == SR and obj['served'] == 0


def test_wav_stream_bytes_exact(server):
    resp, data = get(server, '/tts?text=hello&seed=0')
    assert resp.status == 200
    assert resp.getheader('Content-Type') == 'audio/wav'
    assert resp.getheader('Transfer-Encoding') == 'chunked'
    header = wav_stream_header(SR)
    assert data[:44] == header
    # header fields: PCM, mono, rate, 16-bit
    fmt = struct.unpack('<IHHIIHH', header[16:36])
    assert fmt[1:4] == (1, 1, SR)
    expected = b''.join(float_to_pcm16(c) for c in server.chunks)
    assert data[44:] == expected


def test_f32_roundtrip_and_seed(server):
    resp, data = get(server, '/tts?text=hello&seed=1&format=f32')
    assert resp.status == 200
    got = np.frombuffer(data, np.float32)
    expected = np.concatenate([c * 0.5 for c in server.chunks])
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_post_json(server):
    body = json.dumps({'text': 'hi', 'format': 'pcm16'})
    resp, data = get(server, '/tts', method='POST', body=body)
    assert resp.status == 200
    assert data == b''.join(float_to_pcm16(c) for c in server.chunks)


def test_bad_requests(server):
    assert get(server, '/tts')[0].status == 400                      # empty text
    assert get(server, '/tts?text=x&format=mp3')[0].status == 400    # bad format
    assert get(server, '/nope')[0].status == 404
    long = 'x' * 3000
    assert get(server, f'/tts?text={long}')[0].status == 400


def test_chunks_stream_before_generation_finishes(server):
    """First audio bytes must arrive while the generator is still producing."""
    conn = http.client.HTTPConnection(*server.address, timeout=10)
    conn.request('GET', '/tts?text=hello')
    resp = conn.getresponse()
    first = resp.read(44 + len(float_to_pcm16(server.chunks[0])))
    # generator still mid-stream (2 more chunks, each behind a sleep)
    assert server.state['in_flight'] == 1
    assert first[:4] == b'RIFF'
    resp.read()  # drain
    conn.close()


def test_concurrent_requests_serialize_on_device_lock(server):
    """Two parallel requests both succeed; generation never overlaps."""
    results = []

    def one(seed):
        resp, data = get(server, f'/tts?text=hello&seed={seed}&format=f32')
        results.append((resp.status, len(data)))

    threads = [threading.Thread(target=one, args=(0,)) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert [r[0] for r in results] == [200, 200]
    assert all(r[1] == sum(len(c) * 4 for c in server.chunks) for r in results)
    assert server.state['max_in_flight'] == 1  # the device lock serialized them
    assert json.loads(get(server, '/healthz')[1])['served'] >= 2


def test_measure_ttfa_client_parses_stream(server):
    """The TTFA measurement client (scripts/measure_ttfa.py) decodes the
    chunked-transfer stream correctly against the fake server: all audio bytes
    accounted for, first-audio time recorded before stream end."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        'measure_ttfa', os.path.join(os.path.dirname(__file__), '..',
                                     'scripts', 'measure_ttfa.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    host, port = server.address
    r = mod.one_request('hello', host, port)
    n_samples = sum(len(c) for c in server.chunks)
    assert r['audio_seconds'] == round(n_samples * 2 / 2 / 22050, 3)
    assert r['ttfa_first_audio_s'] is not None
    assert r['ttfa_first_audio_s'] <= r['total_wall_s']
    assert r['n_chunks'] >= 1
