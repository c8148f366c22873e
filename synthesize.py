#!/usr/bin/env python
"""Synthesis CLI (reference synthesize.py): Tacotron / WaveNet / end-to-end Tacotron-2."""

import argparse
import os

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.utils.infolog import log


def get_sentences(args, hparams):
    if args.text_list:
        with open(args.text_list, 'rb') as f:
            sentences = list(map(lambda l: l.decode('utf-8')[:-1], f.readlines()))
    else:
        sentences = hparams.sentences
    return sentences


def synthesize(args, hparams, taco_checkpoint, wave_checkpoint, sentences):
    log('Running End-to-End TTS Evaluation. Model: {}'.format(args.name or args.model))
    log('Synthesizing mel-spectrograms from text..')
    from tacotron2_tpu.inference.tacotron_synthesizer import tacotron_synthesize
    wavenet_in_dir = tacotron_synthesize(args, hparams, taco_checkpoint, sentences)
    log('Synthesizing audio from mel-spectrograms.. (This may take a while)')
    from tacotron2_tpu.inference.wavenet_synthesizer import wavenet_synthesize
    wavenet_synthesize(args, hparams, wave_checkpoint, wavenet_in_dir)
    log('Tacotron-2 TTS synthesis complete!')


def main():
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    accepted_modes = ['eval', 'synthesis', 'live']
    parser = argparse.ArgumentParser()
    parser.add_argument('--checkpoint', default='pretrained/', help='Path to model checkpoint')
    parser.add_argument('--hparams', default='',
                        help='Hyperparameter overrides as a comma-separated list of name=value pairs')
    parser.add_argument('--name', help='Name of logging directory if the model were trained together with Tacotron-2.')
    parser.add_argument('--tacotron_name', help='Name of logging directory of Tacotron. If trained separately')
    parser.add_argument('--wavenet_name', help='Name of logging directory of WaveNet. If trained separately')
    parser.add_argument('--model', default='Tacotron-2')
    parser.add_argument('--input_dir', default='training_data/',
                        help='folder to contain inputs sentences/targets')
    parser.add_argument('--mels_dir', default='tacotron_output/eval/',
                        help='folder to contain mels to synthesize audio from using the Wavenet')
    parser.add_argument('--output_dir', default='output/',
                        help='folder to contain synthesized mel spectrograms')
    parser.add_argument('--mode', default='eval', help='mode of run: can be one of {}'.format(accepted_modes))
    parser.add_argument('--GTA', default='True',
                        help='Ground truth aligned synthesis, defaults to True, only considered in synthesis mode')
    parser.add_argument('--text_list', default='',
                        help='Text file contains list of texts to be synthesized. Valid if mode=eval')
    parser.add_argument('--speaker_id', default=None,
                        help='Defines the speakers ids to use when running standalone Wavenet on a folder of mels. this variable must be a comma-separated list of ids')
    parser.add_argument('--base_dir', default='')
    args = parser.parse_args()

    accepted_models = ['Tacotron', 'WaveNet', 'Tacotron-2']
    if args.model not in accepted_models:
        raise ValueError('please enter a valid model to synthesize with: {}'.format(accepted_models))
    if args.mode not in accepted_modes:
        raise ValueError('accepted modes are: {}, found {}'.format(accepted_modes, args.mode))
    if args.mode == 'live' and args.model == 'Wavenet':
        raise RuntimeError('Wavenet vocoder cannot be tested live due to its slow generation. Live only works with Tacotron!')
    if args.GTA not in ('True', 'False'):
        raise ValueError('GTA option must be either True or False')

    if args.model == 'Tacotron-2':
        if args.mode == 'live':
            raise ValueError('Tacotron-2 does not support live mode, as the wavenet is only used in synthesis.')

    hparams = default_hparams()
    hparams.parse(args.hparams)

    taco_pretrained = os.path.join(args.base_dir,
                                   'logs-' + (args.tacotron_name or args.name or args.model),
                                   'taco_pretrained') if args.model != 'WaveNet' else None
    wave_pretrained = os.path.join(args.base_dir,
                                   'logs-' + (args.wavenet_name or args.name or args.model),
                                   'wave_pretrained') if args.model != 'Tacotron' else None

    sentences = get_sentences(args, hparams)

    if args.model == 'Tacotron':
        from tacotron2_tpu.inference.tacotron_synthesizer import tacotron_synthesize
        tacotron_synthesize(args, hparams, taco_pretrained, sentences)
    elif args.model == 'WaveNet':
        from tacotron2_tpu.inference.wavenet_synthesizer import wavenet_synthesize
        wavenet_synthesize(args, hparams, wave_pretrained, args.mels_dir)
    elif args.model == 'Tacotron-2':
        synthesize(args, hparams, taco_pretrained, wave_pretrained, sentences)


if __name__ == '__main__':
    main()
