#!/usr/bin/env python
"""Synthesis CLI: drive a trained Tacotron, a trained WaveNet, or both chained.

Flag surface mirrors the reference `synthesize.py` so existing invocations keep
working; the implementations live in `tacotron2_tpu.inference`.
"""

import argparse
import os

from tacotron2_tpu.config import default_hparams, paper_hparams
from tacotron2_tpu.utils.infolog import log

MODES = ('eval', 'synthesis', 'live', 'stream')
MODELS = ('Tacotron', 'WaveNet', 'Tacotron-2')


def get_sentences(args, hparams):
    """Text to synthesize: `--text_list` file (one sentence per line) or the
    built-in eval corpus (config.py sentences)."""
    if args.text_list:
        with open(args.text_list, encoding='utf-8') as f:
            return [line.rstrip('\n') for line in f]
    return hparams.sentences


def synthesize(args, hparams, taco_checkpoint, wave_checkpoint, sentences):
    """Chained two-stage synthesis: text → mel (Tacotron) → waveform (WaveNet)."""
    log('End-to-end synthesis, run name: {}'.format(args.name or args.model))
    log('Stage 1/2: Tacotron text->mel')
    from tacotron2_tpu.inference.tacotron_synthesizer import tacotron_synthesize
    wavenet_in_dir = tacotron_synthesize(args, hparams, taco_checkpoint, sentences)
    log('Stage 2/2: WaveNet mel->waveform (autoregressive — the slow part)')
    from tacotron2_tpu.inference.wavenet_synthesizer import wavenet_synthesize
    wavenet_synthesize(args, hparams, wave_checkpoint, wavenet_in_dir)
    log('End-to-end synthesis done.')


def stream_synthesize(args, hparams, taco_checkpoint, wave_checkpoint, sentences):
    """Streaming two-stage synthesis: waveform chunks yielded while the vocoder
    is still generating (state-carried AR kernel). Writes one wav per sentence
    and logs the time-to-first-audio per utterance."""
    import time

    import numpy as np

    from tacotron2_tpu.inference.streaming import StreamingSynthesizer
    from tacotron2_tpu.ops import audio

    out_dir = os.path.join(args.output_dir, 'stream')
    os.makedirs(out_dir, exist_ok=True)
    synth = StreamingSynthesizer().load(
        taco_checkpoint, wave_checkpoint, hparams,
        wavenet_step=getattr(args, 'wavenet_checkpoint_step', None))
    for i, text in enumerate(sentences):
        t0 = time.time()
        chunks = []
        for j, chunk in enumerate(synth.stream(text, seed=i)):
            if j == 0:
                log('sentence {}: first audio chunk ({} samples, {:.2f} s of audio) '
                    'after {:.3f} s'.format(i, len(chunk),
                                            len(chunk) / hparams.sample_rate,
                                            time.time() - t0))
            chunks.append(chunk)
        wav = np.concatenate(chunks)
        log('sentence {}: {:.2f} s of audio in {:.3f} s wall ({} chunks)'.format(
            i, len(wav) / hparams.sample_rate, time.time() - t0, len(chunks)))
        audio.save_wav(wav, os.path.join(out_dir, f'stream-{i}.wav'),
                       sr=hparams.sample_rate)
    log('streaming synthesis done: {}'.format(out_dir))


def _log_dir(base_dir, name):
    return os.path.join(base_dir, 'logs-' + name)


def main():
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    parser = argparse.ArgumentParser(
        description='Synthesize speech with trained Tacotron/WaveNet checkpoints.')
    parser.add_argument('--checkpoint', default='pretrained/',
                        help='checkpoint path override')
    parser.add_argument('--hparams', default='',
                        help="comma-separated 'name=value' hyperparameter overrides")
    parser.add_argument('--paper_profile', action='store_true',
                        help='start from the exact-paper hparams profile (reference '
                             'paper_hparams.py swap-in); --hparams applies on top')
    parser.add_argument('--name',
                        help='run name shared by both models (joint Tacotron-2 training)')
    parser.add_argument('--tacotron_name',
                        help='run name of a separately trained Tacotron')
    parser.add_argument('--wavenet_name',
                        help='run name of a separately trained WaveNet')
    parser.add_argument('--model', default='Tacotron-2')
    parser.add_argument('--input_dir', default='training_data/',
                        help='preprocessed dataset dir (GTA synthesis reads its train.txt)')
    parser.add_argument('--mels_dir', default='tacotron_output/eval/',
                        help='dir of mel .npys to vocode when running WaveNet standalone')
    parser.add_argument('--output_dir', default='output/',
                        help='where synthesized mels/wavs are written')
    parser.add_argument('--mode', default='eval',
                        help='one of {} (Tacotron only)'.format(list(MODES)))
    parser.add_argument('--GTA', default='True',
                        help="'True'/'False': teacher-forced (ground-truth-aligned) "
                             'synthesis; synthesis mode only')
    parser.add_argument('--text_list', default='',
                        help='file of sentences to synthesize in eval mode')
    parser.add_argument('--speaker_id', default=None,
                        help='comma-separated speaker ids for standalone multi-speaker '
                             'WaveNet over a mels dir')
    parser.add_argument('--wavenet_checkpoint_step', default=None,
                        help="WaveNet checkpoint to load: a step number, 'latest' "
                             "(default), or 'best' — pick the step whose in-training "
                             'natural eval scored best (AR conditioning response '
                             'overfits while the teacher-forced loss stays healthy; '
                             'docs/round5/RESULTS.md §3)')
    parser.add_argument('--base_dir', default='')
    args = parser.parse_args()

    if args.model not in MODELS:
        raise ValueError('--model must be one of {}, got {!r}'.format(list(MODELS), args.model))
    if args.mode not in MODES:
        raise ValueError('--mode must be one of {}, got {!r}'.format(list(MODES), args.mode))
    if args.GTA not in ('True', 'False'):
        raise ValueError("--GTA takes 'True' or 'False'")
    if args.mode == 'live' and args.model != 'Tacotron':
        # Autoregressive vocoding adds seconds of latency; live REPL is mel+GL only.
        raise ValueError('live mode is Tacotron-only (Griffin-Lim playback)')
    if args.mode == 'stream' and args.model != 'Tacotron-2':
        raise ValueError('stream mode needs both stages (--model=Tacotron-2)')

    hparams = paper_hparams() if args.paper_profile else default_hparams()
    hparams.parse(args.hparams)

    taco_pretrained = wave_pretrained = None
    if args.model != 'WaveNet':
        taco_pretrained = os.path.join(
            _log_dir(args.base_dir, args.tacotron_name or args.name or args.model),
            'taco_pretrained')
    if args.model != 'Tacotron':
        wave_pretrained = os.path.join(
            _log_dir(args.base_dir, args.wavenet_name or args.name or args.model),
            'wave_pretrained')

    sentences = get_sentences(args, hparams)

    if args.model == 'Tacotron':
        from tacotron2_tpu.inference.tacotron_synthesizer import tacotron_synthesize
        tacotron_synthesize(args, hparams, taco_pretrained, sentences)
    elif args.model == 'WaveNet':
        from tacotron2_tpu.inference.wavenet_synthesizer import wavenet_synthesize
        wavenet_synthesize(args, hparams, wave_pretrained, args.mels_dir)
    elif args.mode == 'stream':
        stream_synthesize(args, hparams, taco_pretrained, wave_pretrained, sentences)
    else:
        synthesize(args, hparams, taco_pretrained, wave_pretrained, sentences)


if __name__ == '__main__':
    main()
