#!/usr/bin/env python
"""Streaming TTS HTTP service CLI.

Serves text→speech over HTTP/1.1 chunked transfer: clients receive waveform
chunks while the WaveNet vocoder is still generating (state-carried Pallas AR
kernel), so playback starts at time-to-first-chunk instead of end-of-utterance.

    python serve.py --taco_checkpoint logs-X/taco_pretrained \
                    --wave_checkpoint logs-X/wave_pretrained [--port 8000]

    curl -N 'http://localhost:8000/tts?text=Hello+world' --output hello.wav
    curl    'http://localhost:8000/healthz'

Endpoints: GET/POST /tts (text, seed, format=wav|pcm16|f32), GET /healthz.
One utterance generates at a time (single accelerator); concurrent requests
queue behind the device lock, bounded by --max-waiters (then 503).
"""

import argparse
import os

from tacotron2_tpu.config import default_hparams, paper_hparams
from tacotron2_tpu.utils.infolog import log


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument('--base_dir', default='')
    p.add_argument('--taco_checkpoint', default='logs-Tacotron-2/taco_pretrained',
                   help='Tacotron checkpoint directory')
    p.add_argument('--wave_checkpoint', default='logs-Tacotron-2/wave_pretrained',
                   help='WaveNet checkpoint directory')
    p.add_argument('--hparams', default='',
                   help='comma-separated name=value hparam overrides')
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8000)
    p.add_argument('--max-waiters', type=int, default=8, dest='max_waiters')
    p.add_argument('--chunk_seconds', type=float, default=0.75)
    p.add_argument('--first_chunk_seconds', type=float, default=0.20,
                   help='smaller first chunk = faster time-to-first-audio')
    p.add_argument('--no-warmup', action='store_true',
                   help='skip the warmup synthesis (first request pays compiles)')
    p.add_argument('--warmup_buckets', type=int, default=3,
                   help='text-length buckets (of pad_text_multiple chars) to '
                        'pre-compile at startup')
    p.add_argument('--paper_profile', action='store_true',
                   help='start from the exact-paper hparams profile (reference '
                        'paper_hparams.py swap-in); --hparams applies on top')
    p.add_argument('--wavenet_checkpoint_step', default=None,
                   help="WaveNet checkpoint to serve: a step number, 'latest' "
                        "(default), or 'best' (natural-eval selection; AR "
                        'conditioning overfits while teacher-forced loss stays '
                        'healthy — docs/round5/RESULTS.md §3)')
    args = p.parse_args()

    hp = paper_hparams() if args.paper_profile else default_hparams()
    if args.hparams:
        hp.parse(args.hparams)

    from tacotron2_tpu.inference.server import TTSServer
    from tacotron2_tpu.inference.streaming import StreamingSynthesizer

    synth = StreamingSynthesizer().load(
        os.path.join(args.base_dir, args.taco_checkpoint),
        os.path.join(args.base_dir, args.wave_checkpoint), hp,
        wavenet_step=args.wavenet_checkpoint_step)

    def stream_fn(text, seed):
        return synth.stream(text, seed=seed, chunk_seconds=args.chunk_seconds,
                            first_chunk_seconds=args.first_chunk_seconds)

    if not args.no_warmup:
        # One warmup per text-length bucket (pad_text_multiple chars each): the
        # decode program is compiled per bucket, so warming only one length
        # leaves every other bucket's first request paying a trace+compile
        # (measured: 4.3 s extra on this box, docs/round5/ttfa/).
        log('Warmup synthesis (compiles the decode + vocode programs)...')
        filler = 'All work and no play makes Jack a dull boy. '
        for bucket in range(1, args.warmup_buckets + 1):
            text = (filler * 8)[:hp.pad_text_multiple * bucket - 4]
            for _ in stream_fn(text, 0):
                pass
            log('  warmed text bucket {} ({} chars)'.format(bucket, len(text)))
        log('Warmup done.')

    server = TTSServer(stream_fn, sample_rate=hp.sample_rate, host=args.host,
                       port=args.port, max_waiters=args.max_waiters)
    log('Streaming TTS service on http://{}:{}  (GET /tts?text=..., /healthz)'
        .format(*server.address))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        log('Shutting down.')
        server.close()


if __name__ == '__main__':
    main()
