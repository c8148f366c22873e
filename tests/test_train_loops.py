"""In-process smoke tests for the two training loops (VERDICT r1: the 525 LoC of
loop code — checkpoint/restore, eval artifacts, Prefetcher wiring — must not be
CI-dark). Runs a few real steps of tacotron_train/wavenet_train on a tmpdir
synthetic corpus with tiny configs, then restores from the checkpoint."""

import argparse
import os

import numpy as np
import pytest

from tacotron2_tpu.config import default_hparams

# batch size 8: conftest pins 8 virtual CPU devices and the mesh covers all of them
TACO_TINY = (
    "embedding_dim=32,enc_conv_channels=32,enc_conv_num_layers=1,encoder_lstm_units=16,"
    "attention_dim=16,attention_filters=8,attention_kernel=[7],prenet_layers=[16,16],"
    "decoder_lstm_units=32,postnet_channels=32,postnet_num_layers=2,cbhg_kernels=4,"
    "cbhg_conv_channels=16,cbhg_projection=16,cbhg_highway_units=16,cbhg_rnn_units=16,"
    "outputs_per_step=2,tacotron_batch_size=8,tacotron_test_size=None,"
    "tacotron_test_batches=1,griffin_lim_iters=2,bucket_group_batches=2,"
    "pad_mel_multiple=16,decoder_scan_unroll=1,predict_linear=False")

WN_TINY = ("layers=4,stacks=2,residual_channels=8,gate_channels=16,skip_out_channels=8,"
           "upsample_scales=[5,55],max_time_steps=1100,wavenet_batch_size=8,"
           "wavenet_test_size=None,wavenet_test_batches=1,train_with_GTA=False")

HOP, N_MELS, FRAMES = 275, 80, 16


def _write_corpus(base: str, n: int = 24):
    """Synthetic preprocessed training_data/ (what preprocess.py would emit)."""
    td = os.path.join(base, 'training_data')
    for sub in ('mels', 'audio', 'linear'):
        os.makedirs(os.path.join(td, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        frames = FRAMES
        mel = rng.uniform(-4, 4, (frames, N_MELS)).astype(np.float32)
        wav = rng.uniform(-0.5, 0.5, frames * HOP).astype(np.float32)
        np.save(os.path.join(td, 'mels', f'mel-{i}.npy'), mel)
        np.save(os.path.join(td, 'audio', f'audio-{i}.npy'), wav)
        rows.append(f'audio-{i}.npy|mel-{i}.npy|mel-{i}.npy|{frames * HOP}|{frames}|'
                    f'test sentence number {i}.')
    with open(os.path.join(td, 'train.txt'), 'w') as f:
        f.write('\n'.join(rows) + '\n')
    # WaveNet consumes a map.txt with base-relative paths (the GTA bridge format,
    # reference tacotron/synthesize.py:104-113)
    map_rows = [f'training_data/audio/audio-{i}.npy|training_data/mels/mel-{i}.npy|'
                f'training_data/mels/mel-{i}.npy|<no_g>|test sentence number {i}.'
                for i in range(n)]
    with open(os.path.join(td, 'map.txt'), 'w') as f:
        f.write('\n'.join(map_rows) + '\n')
    return td


def _args(base, **kw):
    ns = argparse.Namespace(
        base_dir=base, tacotron_input='training_data/train.txt',
        wavenet_input='training_data/train.txt', model='Tacotron',
        restore=True, summary_interval=100, embedding_interval=0,
        checkpoint_interval=2, eval_interval=2, tacotron_train_steps=2,
        wavenet_train_steps=2, profile_step=0, slack_url=None)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    base = str(tmp_path_factory.mktemp('loops'))
    _write_corpus(base)
    return base


def test_tacotron_train_loop_smoke(corpus):
    from tacotron2_tpu.training.tacotron_train import tacotron_train
    hp = default_hparams()
    hp.parse(TACO_TINY)
    log_dir = os.path.join(corpus, 'logs-taco')
    os.makedirs(log_dir, exist_ok=True)

    save_dir = tacotron_train(_args(corpus, tacotron_train_steps=2), log_dir, hp)
    assert save_dir == os.path.join(log_dir, 'taco_pretrained')

    # checkpoint written at step 2 (checkpoint_interval), eval artifacts at step 2
    from tacotron2_tpu.training.checkpointing import CheckpointManager
    assert CheckpointManager(save_dir, max_to_keep=20).latest_step() == 2
    assert os.path.isfile(os.path.join(log_dir, 'plots', 'step-2-align.png'))
    assert os.path.isfile(os.path.join(log_dir, 'wavs', 'step-2-wave-from-mel.wav'))
    assert os.path.isfile(os.path.join(
        log_dir, 'eval-dir', 'plots', 'step-2-eval-align.png'))
    assert os.path.isfile(os.path.join(
        log_dir, 'mel-spectrograms', 'mel-prediction-step-2.npy'))
    assert os.path.isfile(os.path.join(log_dir, 'CharacterEmbeddings.tsv'))

    # restore path: resumes from step 2 and runs one more step (same hp object:
    # identity-hashed jit keys mean reuse avoids a full recompile)
    tacotron_train(_args(corpus, tacotron_train_steps=3, checkpoint_interval=3,
                         eval_interval=100), log_dir, hp)
    assert CheckpointManager(save_dir, max_to_keep=20).latest_step() == 3


def test_scheduled_sampling_early_decay_guard(corpus, capsys):
    """Decaying tfr before convergence destroys free-run content (measured:
    DTW centroid-r 0.08 early vs 0.920 late, docs/round4/RESULTS.md §6) — the
    loop must warn when start_decay lands early in the budget."""
    from tacotron2_tpu.training.tacotron_train import tacotron_train
    hp = default_hparams()
    hp.parse(TACO_TINY + ",tacotron_teacher_forcing_mode='scheduled',"
             "tacotron_teacher_forcing_start_decay=0,"
             "tacotron_teacher_forcing_decay_steps=4")
    log_dir = os.path.join(corpus, 'logs-taco-ss')
    os.makedirs(log_dir, exist_ok=True)
    tacotron_train(_args(corpus, tacotron_train_steps=2, eval_interval=100,
                         checkpoint_interval=2), log_dir, hp)
    out = capsys.readouterr().out
    assert 'DESTROYS free-run content' in out

    # decay-late (start_decay >= half the budget) must NOT warn
    hp2 = default_hparams()
    hp2.parse(TACO_TINY + ",tacotron_teacher_forcing_mode='scheduled',"
              "tacotron_teacher_forcing_start_decay=2,"
              "tacotron_teacher_forcing_decay_steps=4")
    log_dir2 = os.path.join(corpus, 'logs-taco-ss2')
    os.makedirs(log_dir2, exist_ok=True)
    tacotron_train(_args(corpus, tacotron_train_steps=3, eval_interval=100,
                         checkpoint_interval=3), log_dir2, hp2)
    assert 'DESTROYS free-run content' not in capsys.readouterr().out


def test_wavenet_train_loop_smoke(corpus, capsys):
    from tacotron2_tpu.training.wavenet_train import wavenet_train
    hp = default_hparams()
    hp.parse(WN_TINY)
    log_dir = os.path.join(corpus, 'logs-wave')
    os.makedirs(log_dir, exist_ok=True)
    input_path = os.path.join(corpus, 'training_data', 'map.txt')

    save_dir = wavenet_train(_args(corpus, wavenet_train_steps=2), log_dir, hp, input_path)
    assert save_dir == os.path.join(log_dir, 'wave_pretrained')
    out = capsys.readouterr().out
    # short-run EMA guard: 2 steps at decay 0.9999 leaves the shadow
    # init-dominated — the loop must warn (round-2 hardware footgun)
    assert 'EMA shadow init-dominated' in out
    # AR conditioning tripwire logged at eval (round-5 overfit finding):
    # either the metric or its structured skip line, never a silent absence
    assert ('Eval AR conditioning centroid-r' in out
            or 'AR conditioning metric skipped' in out)

    from tacotron2_tpu.training.checkpointing import CheckpointManager
    assert CheckpointManager(save_dir, max_to_keep=20).latest_step() == 2
    # teacher-forced dump at the checkpoint + AR eval artifacts at eval_interval
    assert os.path.isfile(os.path.join(log_dir, 'wavs', 'step-2-pred.wav'))
    assert os.path.isfile(os.path.join(log_dir, 'wavs', 'step-2-real.wav'))
    assert os.path.isfile(os.path.join(log_dir, 'eval-dir', 'wavs', 'step-2-pred.wav'))

    wavenet_train(_args(corpus, wavenet_train_steps=3, checkpoint_interval=3,
                        eval_interval=100), log_dir, hp, input_path)
    assert CheckpointManager(save_dir, max_to_keep=20).latest_step() == 3


def _assert_device_committed(tree):
    import jax
    leaves = jax.tree_util.tree_leaves(tree)
    assert leaves
    host = [l for l in leaves if not isinstance(l, jax.Array)]
    assert not host, f'{len(host)}/{len(leaves)} restored leaves are host arrays'


def test_synthesizer_load_pins_weights_on_device(corpus):
    """Restored weights must be device-committed jax.Arrays. orbax restores
    HOST numpy, and every jitted call re-uploaded the full weight tree
    (~100 MB/request full-size) — the streaming-TTFA long pole fixed round 5
    (7.5 s -> 0.10 s, docs/round5/RESULTS.md §2). Pin the fix in both loaders."""
    from tacotron2_tpu.training.checkpointing import CheckpointManager

    taco_dir = os.path.join(corpus, 'logs-taco', 'taco_pretrained')
    if CheckpointManager(taco_dir).latest_step() is None:
        from tacotron2_tpu.training.tacotron_train import tacotron_train
        hp = default_hparams()
        hp.parse(TACO_TINY)
        tacotron_train(_args(corpus, tacotron_train_steps=2, eval_interval=100),
                       os.path.join(corpus, 'logs-taco'), hp)
    hp = default_hparams()
    hp.parse(TACO_TINY)
    from tacotron2_tpu.inference.tacotron_synthesizer import Synthesizer as TacoSynth
    ts = TacoSynth()
    ts.load(taco_dir, hp)
    _assert_device_committed(ts._variables)

    wave_dir = os.path.join(corpus, 'logs-wave', 'wave_pretrained')
    if CheckpointManager(wave_dir).latest_step() is None:
        from tacotron2_tpu.training.wavenet_train import wavenet_train
        hp = default_hparams()
        hp.parse(WN_TINY)
        wavenet_train(_args(corpus, wavenet_train_steps=2, eval_interval=100),
                      os.path.join(corpus, 'logs-wave'), hp,
                      os.path.join(corpus, 'training_data', 'map.txt'))
    hp = default_hparams()
    hp.parse(WN_TINY)
    from tacotron2_tpu.inference.wavenet_synthesizer import Synthesizer as WaveSynth
    ws = WaveSynth()
    ws.load(wave_dir, hp)
    _assert_device_committed(ws._params)
