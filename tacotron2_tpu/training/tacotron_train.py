"""Tacotron training loop (reference tacotron/train.py:114-399).

Same operational surface — dir scaffolding, restore-or-create, rolling sec/step + loss
window, loss-explosion abort, summary/eval/checkpoint intervals, eval artifact dumps
(alignment plot, target-vs-pred spectrograms, Griffin-Lim wav), char-embedding TSV —
re-hosted on the TPU stack: jitted train step over a device mesh, orbax checkpoints,
tensorboardX summaries, on-device Griffin-Lim.
"""

import os
import time
import traceback
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Hparams, hparams_debug_string
from ..data.loader import Prefetcher, TacotronDataset
from ..ops import audio
from ..ops.dsp_jax import inv_linear_spectrogram_jax, inv_mel_spectrogram_jax
from ..parallel import distributed
from ..parallel import mesh as mesh_lib
from ..text import sequence_to_text, symbols
from ..utils import ValueWindow, plot
from ..utils.infolog import log
from . import tacotron_trainer as tt
from .checkpointing import CheckpointManager


def time_string():
    return datetime.now().strftime('%Y-%m-%d %H:%M')


def create_summary_writer(tb_dir):
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(tb_dir)
    except Exception as e:
        log(f'tensorboardX unavailable ({e}); scalar summaries disabled')
        return None


def add_embedding_tsv(log_dir: str):
    """Character embedding metadata for the projector (reference train.py:26-39)."""
    path = os.path.join(log_dir, 'CharacterEmbeddings.tsv')
    if not os.path.isfile(path):
        with open(path, 'w', encoding='utf-8') as f:
            for symbol in symbols:
                if symbol == ' ':
                    symbol = '\\s'
                f.write(f'{symbol}\n')
    return path


def _gl_invert_mel(mel: np.ndarray, hp: Hparams) -> np.ndarray:
    """mel (T, M) → wav, on-device GL when GL_on_GPU else host numpy."""
    if hp.GL_on_GPU:
        wav = np.asarray(inv_mel_spectrogram_jax(jnp.asarray(mel.T), hp))
        return audio.inv_preemphasis(wav, hp.preemphasis, hp.preemphasize)
    return audio.inv_mel_spectrogram(mel.T, hp)


def _gl_invert_linear(lin: np.ndarray, hp: Hparams) -> np.ndarray:
    if hp.GL_on_GPU:
        wav = np.asarray(inv_linear_spectrogram_jax(jnp.asarray(lin.T), hp))
        return audio.inv_preemphasis(wav, hp.preemphasis, hp.preemphasize)
    return audio.inv_linear_spectrogram(lin.T, hp)


def train(log_dir: str, args, hparams: Hparams):
    hp = hparams
    save_dir = os.path.join(log_dir, 'taco_pretrained')
    plot_dir = os.path.join(log_dir, 'plots')
    wav_dir = os.path.join(log_dir, 'wavs')
    mel_dir = os.path.join(log_dir, 'mel-spectrograms')
    eval_dir = os.path.join(log_dir, 'eval-dir')
    eval_plot_dir = os.path.join(eval_dir, 'plots')
    eval_wav_dir = os.path.join(eval_dir, 'wavs')
    tensorboard_dir = os.path.join(log_dir, 'tacotron_events')
    for d in (save_dir, plot_dir, wav_dir, mel_dir, eval_dir, eval_plot_dir,
              eval_wav_dir, tensorboard_dir):
        os.makedirs(d, exist_ok=True)

    input_path = os.path.join(args.base_dir, args.tacotron_input)
    log('Checkpoint path: {}'.format(save_dir))
    log('Loading training data from: {}'.format(input_path))
    log('Using model: {}'.format(args.model))
    log(hparams_debug_string(hp))

    np.random.seed(hp.tacotron_random_seed)

    # Early-decay guard (docs/round4/RESULTS.md §6, measured): scheduled sampling
    # is a fine-tune for a CONVERGED tfr=1.0 model, not a from-scratch curriculum —
    # decaying tfr while the model was still immature destroyed free-run content
    # (DTW centroid-r 0.08 vs 0.920 when decaying after convergence on the same
    # corpus/decay width). The reference default (start_decay=10000 on its 100k
    # budget, reference hparams.py:285, train.py:114) decays early and is exposed
    # to the same footgun. Convergence isn't knowable a priori, so warn on the
    # budget fraction; the analog of wavenet_train's short-run EMA guard.
    if (hp.tacotron_teacher_forcing_mode == 'scheduled'
            and hp.tacotron_teacher_forcing_start_decay
                < 0.5 * args.tacotron_train_steps):
        log('WARNING: tacotron_teacher_forcing_start_decay={} is early in the '
            '{}-step budget. Scheduled sampling applied before the tfr=1.0 model '
            'converges DESTROYS free-run content (measured: DTW centroid-r 0.08 '
            'early vs 0.920 late, docs/round4/RESULTS.md §6) while teacher-forced '
            'output stays deceptively fine. Decay only once eval loss has '
            'plateaued and free-run synthesis is already coherent.'.format(
                hp.tacotron_teacher_forcing_start_decay, args.tacotron_train_steps))

    # data
    dataset = TacotronDataset(input_path, hp, base_dir=os.path.dirname(input_path))
    log('Loaded metadata for {} examples ({:.2f} hours)'.format(len(dataset), dataset.hours))
    add_embedding_tsv(log_dir)

    # mesh + model state
    mesh = mesh_lib.make_mesh(hp)
    log(f'Device mesh: {mesh.shape}')
    rng = jax.random.PRNGKey(hp.tacotron_random_seed)
    example = next(dataset.train_batches(seed=hp.tacotron_data_random_state))
    state = tt.create_train_state(hp, rng, example)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    log('Tacotron Parameters: {:.3f} Million.'.format(n_params / 1e6))

    ckpt = CheckpointManager(save_dir, max_to_keep=20)
    if args.restore and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        log('Loading checkpoint at step {}'.format(int(state.step)), slack=True)
    else:
        log('Starting new training!', slack=True)

    state = mesh_lib.replicate(state, mesh)
    train_step, eval_step = tt.make_jitted_steps(hp, mesh)

    # multi-host: every process computes; artifacts/checkpoints come from host 0
    lead = jax.process_index() == 0
    pshard = distributed.process_shard()
    writer = create_summary_writer(tensorboard_dir) if lead else None
    time_window, loss_window = ValueWindow(100), ValueWindow(100)

    batches = Prefetcher(dataset.train_batches(seed=hp.tacotron_data_random_state,
                                               process_shard=pshard),
                         depth=8)
    test_batches = dataset.test_batches()
    log(f'{len(test_batches)} eval batches prepared')

    step = int(jax.device_get(state.step))
    last_batch = None
    pending = None  # (step_num, metrics, start_time) of the still-running step

    def resolve(p):
        """Fetch a dispatched step's metrics (blocks until the device finishes).

        Called AFTER the next step has been dispatched, so the host round-trip
        (~25 ms over the remote tunnel) overlaps the next step's device compute
        instead of serializing with it — this one-step pipeline is worth ~25%
        wall-clock at full size."""
        p_step, p_metrics, p_start = p
        loss = float(jax.device_get(p_metrics['loss']))
        time_window.append(time.time() - p_start)
        loss_window.append(loss)
        message = 'Step {:7d} [{:.3f} sec/step, loss={:.5f}, avg_loss={:.5f}]'.format(
            p_step, time_window.average, loss, loss_window.average)
        log(message, end='\r', slack=(p_step % args.checkpoint_interval == 0))
        if np.isnan(loss) or loss > 100.0:
            log('Loss exploded to {:.5f} at step {}'.format(loss, p_step))
            raise RuntimeError('Loss exploded')

    try:
        while step < args.tacotron_train_steps:
            start = time.time()
            batch = next(batches)
            last_batch = batch
            sb = mesh_lib.shard_batch(batch, mesh)
            profiling = getattr(args, 'profile_step', 0) == step + 1
            if profiling:
                if pending is not None:
                    resolve(pending)
                    pending = None
                log('\nCapturing profiler trace at step {}'.format(step + 1))
                jax.profiler.start_trace(tensorboard_dir)
            state, metrics = train_step(state, sb, rng)
            step += 1  # deterministic: avoids a per-step device fetch of state.step
            if profiling:
                float(jax.device_get(metrics['loss']))  # fence inside the trace
                jax.profiler.stop_trace()
            if pending is not None:
                resolve(pending)
            pending = (step, metrics, start)
            interval_now = (step % args.summary_interval == 0
                            or (test_batches and step % args.eval_interval == 0)
                            or step % args.checkpoint_interval == 0
                            or step in (300, args.tacotron_train_steps)
                            or (getattr(args, 'embedding_interval', 0)
                                and step % args.embedding_interval == 0))
            if interval_now:
                # interval work reads state/metrics synchronously: drain the pipe
                resolve(pending)
                pending = None

            if step % args.summary_interval == 0 and writer is not None:
                log('\nWriting summary at step {}'.format(step))
                for k in ('loss', 'before_loss', 'after_loss', 'stop_token_loss',
                          'regularization_loss', 'linear_loss', 'grad_norm',
                          'learning_rate', 'teacher_forcing_ratio'):
                    if k in metrics:
                        writer.add_scalar(f'train/{k}', float(jax.device_get(metrics[k])), step)
                writer.flush()

            if step % args.eval_interval == 0 and test_batches:
                run_eval(state, eval_step, test_batches, mesh, hp, step, writer,
                         eval_plot_dir, eval_wav_dir, rng, lead=lead)

            if (getattr(args, 'embedding_interval', 0) and
                    step % args.embedding_interval == 0 and writer is not None):
                write_embedding_projection(state, writer, step)

            if (step % args.checkpoint_interval == 0 or
                    step == args.tacotron_train_steps or step == 300):
                save_checkpoint_artifacts(state, ckpt, eval_step, last_batch, mesh, hp,
                                          step, plot_dir, wav_dir, mel_dir, rng,
                                          lead=lead)

        if pending is not None:
            resolve(pending)
            pending = None
        log('Tacotron training complete after {} global steps!'.format(
            args.tacotron_train_steps), slack=True)
        return save_dir
    except Exception as e:
        log('Exiting due to exception: {}'.format(e), slack=True)
        traceback.print_exc()
        raise
    finally:
        batches.close()


def write_embedding_projection(state, writer, step):
    """Character-embedding projector (reference train.py:26-39, 381-388)."""
    try:
        emb = np.asarray(jax.device_get(state.params['inputs_embedding']))
        labels = ['\\s' if s == ' ' else s for s in symbols]
        writer.add_embedding(emb, metadata=labels, global_step=step,
                             tag='inputs_embedding')
    except Exception as e:  # tensorboardX embedding needs extra deps on some setups
        log(f'embedding projection skipped: {e}')


def _shard_global_batch(tb, mesh):
    """Place a batch every host holds in full: multi-process slices to local rows
    first (shard_batch assembles global arrays from per-host pieces)."""
    ps = distributed.process_shard()
    if ps is not None:
        tb = mesh_lib.local_batch_slice(tb, *ps)
    return mesh_lib.shard_batch(tb, mesh)


def run_eval(state, eval_step, test_batches, mesh, hp, step, writer,
             eval_plot_dir, eval_wav_dir, rng, lead=True):
    log('\nRunning evaluation at step {}'.format(step))
    sums = {}
    n = 0
    last = None
    for tb in test_batches:
        m = eval_step(state, _shard_global_batch(tb, mesh), rng)
        m = jax.device_get(m)
        last = (tb, m)
        for k in ('loss', 'before_loss', 'after_loss', 'stop_token_loss', 'linear_loss'):
            if k in m:
                sums[k] = sums.get(k, 0.0) + float(m[k])
        n += 1
    avgs = {k: v / n for k, v in sums.items()}
    log('Eval losses: ' + ', '.join(f'{k}={v:.5f}' for k, v in avgs.items()))
    if writer is not None:
        for k, v in avgs.items():
            writer.add_scalar(f'eval/{k}', v, step)
        writer.flush()
    if not lead:
        return  # compute above is collective; file artifacts come from host 0

    # artifact dump from the last eval batch, sample 0 (reference train.py:286-314)
    tb, m = last
    mel_len = int(tb['targets_lengths'][0])
    mel_pred = np.asarray(m['mel_outputs'][0][:mel_len])
    mel_t = np.asarray(tb['mel_targets'][0][:mel_len])
    align = np.asarray(m['alignments'][0])
    plot.plot_alignment(align, os.path.join(eval_plot_dir, f'step-{step}-eval-align.png'),
                        title='{}, step={}, loss={:.5f}'.format(time_string(), step,
                                                                avgs.get('loss', 0.0)))
    plot.plot_spectrogram(mel_pred,
                          os.path.join(eval_plot_dir, f'step-{step}-eval-mel-spectrogram.png'),
                          title='{}, step={}, loss={:.5f}'.format(time_string(), step,
                                                                  avgs.get('loss', 0.0)),
                          target_spectrogram=mel_t)
    wav = _gl_invert_mel(mel_pred, hp)
    audio.save_wav(wav, os.path.join(eval_wav_dir, f'step-{step}-eval-wave-from-mel.wav'),
                   sr=hp.sample_rate)
    if 'linear_outputs' in m:
        lin_pred = np.asarray(m['linear_outputs'][0][:mel_len])
        wav = _gl_invert_linear(lin_pred, hp)
        audio.save_wav(wav, os.path.join(eval_wav_dir,
                                         f'step-{step}-eval-wave-from-linear.wav'),
                       sr=hp.sample_rate)


def save_checkpoint_artifacts(state, ckpt, eval_step, batch, mesh, hp, step,
                              plot_dir, wav_dir, mel_dir, rng, lead=True):
    log('\nSaving checkpoint + artifacts at step {}'.format(step))
    # orbax save is a collective in multi-process runs (it synchronizes through
    # the coordination service): EVERY process must call it; orbax itself writes
    # from the primary host only. A lead-only call deadlocks the barrier against
    # the other hosts' next collective.
    host_state = jax.device_get(state)
    ckpt.save(step, host_state)
    if batch is None:
        return
    # batch came from the (per-host) loader: already local rows in multi-process
    m = jax.device_get(eval_step(state, mesh_lib.shard_batch(batch, mesh), rng))
    if not lead:
        return
    mel_len = int(batch['targets_lengths'][0])
    mel_pred = np.asarray(m['mel_outputs'][0][:mel_len])
    mel_t = np.asarray(batch['mel_targets'][0][:mel_len])
    np.save(os.path.join(mel_dir, f'mel-prediction-step-{step}.npy'), mel_pred,
            allow_pickle=False)
    plot.plot_alignment(np.asarray(m['alignments'][0]),
                        os.path.join(plot_dir, f'step-{step}-align.png'),
                        title='{}, step={}'.format(time_string(), step))
    plot.plot_spectrogram(mel_pred, os.path.join(plot_dir, f'step-{step}-mel-spectrogram.png'),
                          title='{}, step={}'.format(time_string(), step),
                          target_spectrogram=mel_t)
    wav = _gl_invert_mel(mel_pred, hp)
    audio.save_wav(wav, os.path.join(wav_dir, f'step-{step}-wave-from-mel.wav'),
                   sr=hp.sample_rate)
    log('Input at step {}: {}'.format(step, sequence_to_text(batch['inputs'][0])))


def tacotron_train(args, log_dir, hparams):
    return train(log_dir, args, hparams)
