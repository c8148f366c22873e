#!/usr/bin/env python
"""Training entry point.

Dispatches to the Tacotron or WaveNet trainers, or runs the combined `Tacotron-2`
pipeline: three phases (spectrogram model training, ground-truth-aligned mel
synthesis, vocoder training) executed in order, with progress persisted so an
interrupted run picks up at the first unfinished phase.

Phase progress lives in ``logs-<name>/state_log``. The on-disk format is kept
byte-compatible with the reference implementation (reference train.py:16-32) so
runs started under either codebase resume cleanly: three ``0``/``1`` flags and
the GTA map path, pipe-separated.
"""

import argparse
import os

from tacotron2_tpu.config import default_hparams, paper_hparams
from tacotron2_tpu.utils import infolog
from tacotron2_tpu.utils.infolog import log

PHASES = ('tacotron', 'gta', 'wavenet')


def write_state(path: str, done_flags, gta_map_path: str) -> None:
    """Persist pipeline progress: '<t>|<g>|<w>|<map_path>'."""
    fields = [str(int(bool(f))) for f in done_flags]
    with open(path, 'w') as f:
        f.write('|'.join(fields + [gta_map_path]))


def read_state(path: str):
    """Load pipeline progress written by write_state; fresh state if absent."""
    if not os.path.isfile(path):
        return [False, False, False], ''
    with open(path, 'r') as f:
        fields = f.read().split('|')
    return [bool(int(x)) for x in fields[:-1]], fields[-1]


def str2bool(v: str) -> bool:
    """argparse-safe bool ('--restore False' actually means False)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ('true', '1', 'yes', 'y'):
        return True
    if v.lower() in ('false', '0', 'no', 'n'):
        return False
    raise argparse.ArgumentTypeError(f'expected a boolean, got {v!r}')


def prepare_run(args):
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    hp = paper_hparams() if getattr(args, 'paper_profile', False) else default_hparams()
    hp.parse(args.hparams)
    run_name = args.name or args.model
    log_dir = os.path.join(args.base_dir, 'logs-{}'.format(run_name))
    os.makedirs(log_dir, exist_ok=True)
    infolog.init(os.path.join(log_dir, 'Terminal_train_log'), run_name, args.slack_url)
    return log_dir, hp


def _banner(title: str) -> None:
    rule = '#' * 64
    log('\n{}\n# {}\n{}\n'.format(rule, title, rule))


def run_pipeline(args, log_dir, hparams):
    """The resumable 3-phase Tacotron-2 pipeline."""
    state_file = os.path.join(log_dir, 'state_log')
    done, gta_map = read_state(state_file)

    if all(done):
        log('Pipeline state shows all three phases finished; nothing to do. '
            'Delete {} to retrain.'.format(state_file))
        return

    if not done[0]:
        _banner('Phase 1/3: Tacotron training')
        from tacotron2_tpu.training.tacotron_train import tacotron_train
        checkpoint = tacotron_train(args, log_dir, hparams)
        if checkpoint is None:
            raise RuntimeError('Tacotron training did not produce a checkpoint; '
                               'see the log above for the failure.')
        done[0] = True
        write_state(state_file, done, gta_map)
    else:
        checkpoint = os.path.join(log_dir, 'taco_pretrained')

    if not done[1]:
        _banner('Phase 2/3: ground-truth-aligned synthesis')
        from tacotron2_tpu.inference.tacotron_synthesizer import tacotron_synthesize
        args.mode = 'synthesis'
        gta_map = tacotron_synthesize(args, hparams, checkpoint)
        done[1] = True
        write_state(state_file, done, gta_map)

    if not gta_map:
        raise RuntimeError('No GTA map path recorded after phase 2; cannot start '
                           'WaveNet training. state_log may be corrupt: ' + state_file)

    if not done[2]:
        _banner('Phase 3/3: WaveNet training')
        from tacotron2_tpu.training.wavenet_train import wavenet_train
        checkpoint = wavenet_train(args, log_dir, hparams, gta_map)
        if checkpoint is None:
            raise RuntimeError('WaveNet training did not produce a checkpoint; '
                               'see the log above for the failure.')
        done[2] = True
        write_state(state_file, done, gta_map)

    log('Pipeline complete: all three phases finished.', slack=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--base_dir', default='')
    parser.add_argument('--hparams', default='',
                        help='Hyperparameter overrides as a comma-separated list of name=value pairs')
    parser.add_argument('--paper_profile', action='store_true',
                        help='start from the exact-paper hparams profile instead of the '
                             'defaults (reference paper_hparams.py swap-in); --hparams '
                             'overrides still apply on top')
    parser.add_argument('--tacotron_input', default='training_data/train.txt')
    parser.add_argument('--wavenet_input', default='tacotron_output/gta/map.txt')
    parser.add_argument('--name', help='Name of logging directory.')
    parser.add_argument('--model', default='Tacotron-2')
    parser.add_argument('--input_dir', default='training_data',
                        help='folder to contain inputs sentences/targets')
    parser.add_argument('--output_dir', default='output',
                        help='folder to contain synthesized mel spectrograms')
    parser.add_argument('--mode', default='synthesis', help='mode for synthesis of tacotron after training')
    parser.add_argument('--GTA', default='True',
                        help='Ground truth aligned synthesis, defaults to True, only considered in Tacotron synthesis mode')
    parser.add_argument('--restore', type=str2bool, default=True,
                        help='Set this to False to do a fresh training')
    parser.add_argument('--summary_interval', type=int, default=250,
                        help='Steps between running summary ops')
    parser.add_argument('--embedding_interval', type=int, default=5000,
                        help='Steps between updating embeddings projection visualization')
    parser.add_argument('--checkpoint_interval', type=int, default=2500,
                        help='Steps between writing checkpoints')
    parser.add_argument('--eval_interval', type=int, default=5000,
                        help='Steps between eval on test data')
    parser.add_argument('--tacotron_train_steps', type=int, default=100000,
                        help='total number of tacotron training steps')
    parser.add_argument('--wavenet_train_steps', type=int, default=500000,
                        help='total number of wavenet training steps')
    parser.add_argument('--tf_log_level', type=int, default=1, help='Tensorflow C++ log level.')
    parser.add_argument('--slack_url', default=None, help='slack webhook notification destination link')
    parser.add_argument('--profile_step', type=int, default=0,
                        help='capture a jax.profiler trace around this train step (0 = off)')
    args = parser.parse_args()

    known = ('Tacotron', 'WaveNet', 'Tacotron-2')
    if args.model not in known:
        raise ValueError('unknown --model {!r}; choose one of {}'.format(args.model, known))

    log_dir, hparams = prepare_run(args)

    if args.model == 'Tacotron':
        from tacotron2_tpu.training.tacotron_train import tacotron_train
        tacotron_train(args, log_dir, hparams)
    elif args.model == 'WaveNet':
        from tacotron2_tpu.training.wavenet_train import wavenet_train
        wavenet_train(args, log_dir, hparams, args.wavenet_input)
    else:
        run_pipeline(args, log_dir, hparams)


if __name__ == '__main__':
    main()
