"""Full 3-phase pipeline on a synthetic corpus through the real CLIs.

Slow (~5 min on CPU); gated behind RUN_E2E=1. The same flow is exercised on TPU
hardware during development (see PARITY.md)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import wavfile

RUN = os.environ.get('RUN_E2E') == '1'

TINY = ("embedding_dim=32,enc_conv_channels=32,enc_conv_num_layers=1,encoder_lstm_units=16,"
        "attention_dim=16,attention_filters=8,attention_kernel=[7],prenet_layers=[16,16],"
        "decoder_lstm_units=32,postnet_channels=32,postnet_num_layers=2,cbhg_kernels=4,"
        "cbhg_conv_channels=16,cbhg_projection=16,cbhg_highway_units=16,cbhg_rnn_units=16,"
        "outputs_per_step=2,tacotron_batch_size=4,tacotron_test_size=None,"
        "tacotron_test_batches=1,griffin_lim_iters=3,bucket_group_batches=2,"
        "pad_mel_multiple=16,max_iters=20,tacotron_synthesis_batch_size=4,decoder_scan_unroll=1,"
        "layers=4,stacks=2,residual_channels=8,gate_channels=16,skip_out_channels=8,"
        "upsample_scales=[5,55],max_time_steps=2200,wavenet_batch_size=2,"
        "wavenet_test_size=None,wavenet_test_batches=1,wavenet_synthesis_batch_size=4")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_corpus(base):
    wavs = os.path.join(base, 'LJSpeech-1.1', 'wavs')
    os.makedirs(wavs)
    sr, rows, rng = 22050, [], np.random.default_rng(0)
    for i in range(12):
        name = f'UT-{i:04d}'
        t = np.arange(int(sr * (0.4 + 0.1 * (i % 4)))) / sr
        wav = 0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t) + 0.01 * rng.standard_normal(len(t))
        wavfile.write(os.path.join(wavs, name + '.wav'), sr, (wav * 32767).astype(np.int16))
        rows.append(f'{name}|t|test sentence {i}.')
    with open(os.path.join(base, 'LJSpeech-1.1', 'metadata.csv'), 'w') as f:
        f.write('\n'.join(rows) + '\n')


def _run(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
    # drop conftest's 8-virtual-device flag: the tiny batch sizes here aren't
    # divisible by an 8-way data axis
    env.pop('XLA_FLAGS', None)
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f'{args}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}'
    return r


@pytest.mark.skipif(not RUN, reason='set RUN_E2E=1 to run the slow pipeline test')
def test_full_pipeline(tmp_path):
    base = str(tmp_path)
    _make_corpus(base)
    _run([os.path.join(REPO, 'preprocess.py'), '--base_dir', base], REPO)
    _run([os.path.join(REPO, 'train.py'), '--model=Tacotron-2', '--base_dir', base,
          '--name=E2E', '--tacotron_train_steps=3', '--wavenet_train_steps=2',
          '--checkpoint_interval=3', '--summary_interval=50', '--eval_interval=50',
          '--embedding_interval=0', f'--hparams={TINY}'], REPO)
    with open(os.path.join(base, 'logs-E2E', 'state_log')) as f:
        assert f.read().startswith('1|1|1|')
    _run([os.path.join(REPO, 'synthesize.py'), '--model=Tacotron-2', '--base_dir', base,
          '--name=E2E', f'--hparams={TINY}'], REPO)
    wav_dir = os.path.join(base, 'wavenet_output', 'wavs')
    assert len(os.listdir(wav_dir)) == 16  # default sentence corpus
