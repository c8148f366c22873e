#!/usr/bin/env python
"""Dataset preprocessing CLI (parity with reference preprocess.py arg surface)."""

import argparse
import os
from multiprocessing import cpu_count

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.data import corpora, preprocessor


def write_metadata(metadata, out_dir, hparams):
    with open(os.path.join(out_dir, 'train.txt'), 'w', encoding='utf-8') as f:
        for m in metadata:
            f.write('|'.join([str(x) for x in m]) + '\n')
    mel_frames = sum(int(m[4]) for m in metadata)
    timesteps = sum(int(m[3]) for m in metadata)
    hours = timesteps / hparams.sample_rate / 3600
    print('Wrote {} utterances, {} mel frames, {} audio timesteps, ({:.2f} hours)'.format(
        len(metadata), mel_frames, timesteps, hours))
    print('Max input length (text chars): {}'.format(max(len(m[5]) for m in metadata)))
    print('Max mel frames length: {}'.format(max(int(m[4]) for m in metadata)))
    print('Max audio timesteps length: {}'.format(max(int(m[3]) for m in metadata)))


def run_preprocess(args, hparams):
    input_folders = corpora.norm_data(
        args.base_dir, args.dataset, args.language, args.voice, args.reader,
        args.merge_books == 'True', args.book)
    out_dir = os.path.join(args.base_dir, args.output)
    mel_dir = os.path.join(out_dir, 'mels')
    wav_dir = os.path.join(out_dir, 'audio')
    linear_dir = os.path.join(out_dir, 'linear')
    for d in (mel_dir, wav_dir, linear_dir):
        os.makedirs(d, exist_ok=True)
    metadata = preprocessor.build_from_path(
        hparams, input_folders, mel_dir, linear_dir, wav_dir, args.n_jobs)
    write_metadata(metadata, out_dir, hparams)


def main():
    print('initializing preprocessing..')
    parser = argparse.ArgumentParser()
    parser.add_argument('--base_dir', default='')
    parser.add_argument('--hparams', default='',
                        help='Hyperparameter overrides as a comma-separated list of name=value pairs')
    parser.add_argument('--dataset', default='LJSpeech-1.1')
    parser.add_argument('--language', default='en_US')
    parser.add_argument('--voice', default='female')
    parser.add_argument('--reader', default='mary_ann')
    parser.add_argument('--merge_books', default='False')
    parser.add_argument('--book', default='northandsouth')
    parser.add_argument('--output', default='training_data')
    parser.add_argument('--n_jobs', type=int, default=cpu_count())
    args = parser.parse_args()

    assert args.merge_books in ('False', 'True')
    hparams = default_hparams()
    hparams.parse(args.hparams)
    run_preprocess(args, hparams)


if __name__ == '__main__':
    main()
