"""WaveNet training loop (reference wavenet_vocoder/train.py:194-346).

Operational parity: restore-or-create with EMA weights in the checkpoint (shadow-saver
equivalent), rolling sec/step + loss windows, loss-explosion abort, summary/checkpoint
intervals, eval via full autoregressive generation with frames/sec logging, artifact
dumps (teacher-forced pred/target wavs + plots)."""

import os
import time
import traceback
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Hparams, hparams_debug_string
from ..data.loader import Prefetcher
from ..data.wavenet_loader import WaveNetDataset
from ..ops import audio
from ..ops.mulaw import inv_mulaw, inv_mulaw_quantize, is_mulaw, is_mulaw_quantize
from ..parallel import distributed
from ..parallel import mesh as mesh_lib
from ..utils import ValueWindow, plot
from ..utils.infolog import log
from . import checkpoint_select
from . import wavenet_trainer as wt
from .checkpointing import CheckpointManager


def time_string():
    return datetime.now().strftime('%Y-%m-%d %H:%M')


def _speaker_names(hp: Hparams):
    """Speaker labels for the projector: speakers_path TSV (either 'name\\tid' with
    header or single-column) or the hp.speakers list (reference hparams.py:231-233)."""
    if hp.speakers_path:
        with open(hp.speakers_path, encoding='utf-8') as f:
            rows = [line.rstrip('\n').split('\t') for line in f if line.strip()]
        if rows and len(rows[0]) > 1:
            rows = rows[1:]  # drop header
        return [r[0] for r in rows]
    return list(hp.speakers)


def _to_waveform(y: np.ndarray, hp: Hparams) -> np.ndarray:
    """Model-domain audio → float waveform."""
    if is_mulaw_quantize(hp.input_type):
        return inv_mulaw_quantize(y, hp.quantize_channels)
    if is_mulaw(hp.input_type):
        return inv_mulaw(y, hp.quantize_channels)
    return y


def save_log(step, batch, m, hp, plot_dir, wav_dir):
    """Teacher-forced pred vs target dump (reference train.py:128-162)."""
    y_hat_params = np.asarray(m['y_hat'][0])  # (T, out)
    y_target = np.asarray(batch['audio'][0])
    L = int(batch['input_lengths'][0])
    # take distribution mode/argmax as the displayed prediction
    if is_mulaw_quantize(hp.input_type):
        pred = y_hat_params.argmax(axis=-1)
    elif hp.out_channels == 2:
        pred = y_hat_params[:, 0]
    else:
        nr = hp.out_channels // 3
        k = y_hat_params[:, :nr].argmax(axis=-1)
        pred = np.take_along_axis(y_hat_params[:, nr:2 * nr], k[:, None], axis=1)[:, 0]
    pred_wav = _to_waveform(pred[:L], hp)
    target_wav = _to_waveform(y_target[:L], hp)
    audio.save_wav(pred_wav, os.path.join(wav_dir, f'step-{step}-pred.wav'), hp.sample_rate)
    audio.save_wav(target_wav, os.path.join(wav_dir, f'step-{step}-real.wav'), hp.sample_rate)
    plot.waveplot(os.path.join(plot_dir, f'step-{step}-waveplot.png'), pred_wav, target_wav,
                  hp, title=f'{time_string()}, step={step}')


def eval_step(ema_params, batch, hp, eval_plot_dir, eval_wav_dir, step, writer):
    """Full autoregressive generation on one utterance (reference train.py:89-126).

    Returns the natural-eval metrics dict so the train loop can persist them to
    the eval-history sidecar for checkpoint selection (checkpoint_select.py)."""
    from ..ops.mulaw import is_mulaw_quantize
    from ..ops.pallas import wavenet_ar

    metrics = {}

    c = batch.get('mel_conditions')
    g = batch.get('speaker_ids')
    L = int(batch['input_lengths'][0])
    c1 = jnp.asarray(c[:1]) if c is not None else None
    g1 = jnp.asarray(g[:1]) if g is not None else None
    start = time.time()
    # big-vocab categorical: the (1, T, Q) params array cannot leave the chip at
    # Q=65536 — the kernel scores its own params against ground truth in place
    # and streams back the per-step NLL instead (no scan fallback)
    use_kernel_nll = (hp.wavenet_natural_eval and is_mulaw_quantize(hp.input_type)
                      and c1 is not None and wavenet_ar.is_big_vocab(hp)
                      and wavenet_ar.supports(hp))
    if use_kernel_nll:
        out = wt.generate(ema_params, hp, jax.random.PRNGKey(step), c1, g1,
                          return_params=False,
                          y_eval=jnp.asarray(batch['audio'][:1]))
    else:
        out = wt.generate(ema_params, hp, jax.random.PRNGKey(step), c1, g1,
                          synthesis_length=None if c1 is not None else L,
                          return_params=hp.wavenet_natural_eval)
    audio_out = np.asarray(out['audio'][0])
    elapsed = time.time() - start
    frames_sec = len(audio_out) / max(elapsed, 1e-6)
    metrics['gen_samples_per_sec'] = frames_sec
    log('Eval generation: {} samples in {:.3f} sec ({:.1f} samples/sec)'.format(
        len(audio_out), elapsed, frames_sec))

    if hp.wavenet_natural_eval and 'nll' in out:
        # in-kernel scoring (big vocab): same masked mean the host path computes
        m = (jnp.arange(out['nll'].shape[1])[None, :] < L).astype(jnp.float32)
        nat = jnp.sum(out['nll'] * m) / jnp.maximum(jnp.sum(m), 1.0)
        metrics['natural_loss'] = float(nat)
        log('Eval (natural) loss: {:.5f} (in-kernel)'.format(float(nat)))
        if writer is not None:
            writer.add_scalar('eval/natural_loss', float(nat), step)
    elif hp.wavenet_natural_eval:
        # score the autoregressive prediction against ground truth, UNSHIFTED —
        # incremental y_hat[t] predicts y[t] (reference wavenet.py:497-506)
        from ..models.wavenet import distributions as dist_mod
        from ..ops.mulaw import is_mulaw_quantize as _is_q
        y = jnp.asarray(batch['audio'][:1, :out['params'].shape[1]])
        m = (jnp.arange(y.shape[1])[None, :] < L).astype(jnp.float32)
        if _is_q(hp.input_type):
            nat = dist_mod.masked_cross_entropy_loss(out['params'], y, m)
        elif hp.out_channels == 2:
            nat = dist_mod.gaussian_mle_loss(out['params'], y, hp.quantize_channels,
                                             hp.log_scale_min_gauss, hp.cdf_loss, m)
        else:
            nat = dist_mod.discretized_mix_logistic_loss(out['params'], y,
                                                         hp.quantize_channels,
                                                         hp.log_scale_min, m)
        metrics['natural_loss'] = float(nat)
        log('Eval (natural) loss: {:.5f}'.format(float(nat)))
        if writer is not None:
            writer.add_scalar('eval/natural_loss', float(nat), step)

    pred_wav = _to_waveform(audio_out[:L], hp)
    target_wav = _to_waveform(np.asarray(batch['audio'][0][:L]), hp)

    # AR conditioning tripwire (measured round 5, docs/round5/RESULTS.md §3):
    # free-running conditioning response can overfit away while the
    # teacher-forced loss stays healthy (r 0.96 at 10k steps -> 0.43 at 25k
    # with TF eval loss improving). Track it every eval: correlation between
    # the spectral-centroid trajectory of the GENERATED audio's re-extracted
    # mel and the conditioning mel's own trajectory — frame-aligned, the AR
    # output is exactly the conditioning's L samples. Pick checkpoints by
    # this (or natural_loss), not the teacher-forced loss.
    if c1 is not None:
        try:
            from ..ops.mcd import mel_centroids
            w = audio.preemphasis(pred_wav, hp.preemphasis, hp.preemphasize)
            if hp.rescale:
                w = w / max(float(np.abs(w).max()), 1e-9) * hp.rescaling_max
            gen_mel = audio.melspectrogram(np.asarray(w, np.float32), hp).T
            cond = np.asarray(c1[0], np.float32)
            lo, hi = ((-hp.max_abs_value, hp.max_abs_value) if hp.symmetric_mels
                      else (0.0, hp.max_abs_value))
            cond_mel = cond * (hi - lo) + lo if hp.normalize_for_wavenet else cond
            T = min(len(gen_mel), len(cond_mel))
            cen_g, _ = mel_centroids(gen_mel[:T], hp)
            cen_c, _ = mel_centroids(cond_mel[:T], hp)
            if T >= 8 and np.std(cen_g) > 1e-6 and np.std(cen_c) > 1e-6:
                r = float(np.corrcoef(cen_g, cen_c)[0, 1])
                metrics['ar_conditioning_r'] = r
                log('Eval AR conditioning centroid-r: {:.4f}'.format(r))
                if writer is not None:
                    writer.add_scalar('eval/ar_conditioning_r', r, step)
            else:
                log('AR conditioning metric skipped: {} frames, centroid std '
                    '(gen {:.2g}, cond {:.2g}) — needs >=8 frames and a '
                    'time-varying conditioning trajectory'.format(
                        T, float(np.std(cen_g)), float(np.std(cen_c))))
        except Exception as e:  # observability must never kill training
            log('AR conditioning metric skipped: {}'.format(e))

    audio.save_wav(pred_wav, os.path.join(eval_wav_dir, f'step-{step}-pred.wav'), hp.sample_rate)
    audio.save_wav(target_wav, os.path.join(eval_wav_dir, f'step-{step}-real.wav'), hp.sample_rate)
    plot.waveplot(os.path.join(eval_plot_dir, f'step-{step}-waveplot.png'),
                  pred_wav, target_wav, hp, title=f'{time_string()}, step={step}')
    if writer is not None:
        writer.add_scalar('eval/gen_samples_per_sec', frames_sec, step)
        writer.flush()
    return metrics


def train(log_dir: str, args, hparams: Hparams, input_path: str):
    hp = hparams
    save_dir = os.path.join(log_dir, 'wave_pretrained')
    plot_dir = os.path.join(log_dir, 'plots')
    wav_dir = os.path.join(log_dir, 'wavs')
    eval_dir = os.path.join(log_dir, 'eval-dir')
    eval_plot_dir = os.path.join(eval_dir, 'plots')
    eval_wav_dir = os.path.join(eval_dir, 'wavs')
    tensorboard_dir = os.path.join(log_dir, 'wavenet_events')
    for d in (save_dir, plot_dir, wav_dir, eval_dir, eval_plot_dir, eval_wav_dir,
              tensorboard_dir):
        os.makedirs(d, exist_ok=True)

    log('Checkpoint_path: {}'.format(save_dir))
    log('Loading training data from: {}'.format(input_path))
    log(hparams_debug_string(hp))

    np.random.seed(hp.wavenet_random_seed)
    dataset = WaveNetDataset(input_path, hp, base_dir=args.base_dir)
    log('{} train examples, {} test steps'.format(len(dataset), dataset.test_steps))

    # Short-run EMA guard: with decay d over N steps the EMA shadow still holds
    # d**N of the random init (22% at d=0.9999, N=15k), so EMA-weight synthesis
    # (the synthesizer and AR eval path) is noise even when the raw params vocode
    # fine. The reference's 0.9999 default is sized for its 500k-step budget
    # (reference train.py:115, hparams.py:321).
    ema_horizon = args.wavenet_train_steps * (1.0 - hp.wavenet_ema_decay)
    if ema_horizon < 5.0:
        suggested = max(0.5, 1.0 - 10.0 / max(args.wavenet_train_steps, 1))
        log('WARNING: wavenet_ema_decay={} leaves the EMA shadow init-dominated '
            'after {} steps (init fraction ~{:.0%}). AR eval / synthesis uses EMA '
            'weights; for short runs pass wavenet_ema_decay<={:.4g}.'.format(
                hp.wavenet_ema_decay, args.wavenet_train_steps,
                hp.wavenet_ema_decay ** max(args.wavenet_train_steps, 1), suggested))

    mesh = mesh_lib.make_mesh(hp)
    example = next(dataset.train_batches(seed=hp.wavenet_data_random_state,
                                         group_batches=2))
    state = wt.create_train_state(hp, jax.random.PRNGKey(hp.wavenet_random_seed), example)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    log('WaveNet Parameters: {:.3f} Million.'.format(n_params / 1e6))

    ckpt = CheckpointManager(save_dir, max_to_keep=20)
    if args.restore and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        log('Restored WaveNet checkpoint at step {}'.format(int(state.step)), slack=True)
    else:
        log('Starting new WaveNet training!', slack=True)
        if hp.wavenet_weight_normalization:
            # data-dependent weight-norm init on one real batch
            # (reference wavenet_vocoder/train.py:287-298)
            from .weight_norm_init import data_dependent_init
            log('Running weight-norm data-dependent initialization..')
            new_params = data_dependent_init(state.params, example, hp)
            ema = jax.tree_util.tree_map(lambda x: jnp.asarray(x).copy(), new_params)
            state = state.replace(params=new_params, ema_params=ema,
                                  opt_state=wt.make_optimizer(hp).init(new_params))

    state = mesh_lib.replicate(state, mesh)
    train_step, eval_tf_step = wt.make_jitted_steps(hp, mesh)

    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(tensorboard_dir)
    except Exception:
        writer = None

    lead = jax.process_index() == 0
    time_window, loss_window = ValueWindow(100), ValueWindow(100)
    batches = Prefetcher(dataset.train_batches(seed=hp.wavenet_data_random_state,
                                               process_shard=distributed.process_shard()),
                         depth=8)
    test_batches = dataset.test_batches()
    rng = jax.random.PRNGKey(hp.wavenet_random_seed)

    step = int(jax.device_get(state.step))
    last_batch = None
    pending = None  # (step_num, metrics, start_time) of the still-running step

    def resolve(p):
        """Fetch a dispatched step's metrics after the NEXT step is dispatched,
        overlapping the host round-trip with device compute (one-step pipeline,
        same as tacotron_train)."""
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
        while step < args.wavenet_train_steps:
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
                            or step == args.wavenet_train_steps
                            or (getattr(args, 'embedding_interval', 0)
                                and hp.gin_channels > 0
                                and step % args.embedding_interval == 0))
            if interval_now:
                resolve(pending)
                pending = None

            if step % args.summary_interval == 0 and writer is not None:
                for k in ('loss', 'grad_norm', 'learning_rate'):
                    writer.add_scalar(f'train/{k}', float(jax.device_get(metrics[k])), step)
                writer.flush()

            if step % args.eval_interval == 0 and test_batches:
                log('\nEvaluating at step {}'.format(step))
                # teacher-forced loss averaged over the whole test split (the
                # reference averages Tacotron eval over the split; WaveNet eval
                # should not score one fixed crop forever)
                ps = distributed.process_shard()
                tf_losses = []
                for tb in test_batches:
                    tb_local = mesh_lib.local_batch_slice(tb, *ps) if ps else tb
                    m = jax.device_get(eval_tf_step(state, mesh_lib.shard_batch(
                        tb_local, mesh)))
                    tf_losses.append(float(m['loss']))
                eval_loss = float(np.mean(tf_losses))
                log('Eval (teacher-forced) loss: {:.5f} over {} batches'.format(
                    eval_loss, len(tf_losses)))
                if writer is not None:
                    writer.add_scalar('eval/loss', eval_loss, step)
                if lead:  # AR generation artifacts: single-chip work, host 0 only
                    # rotate through the split so successive evals score
                    # different utterances
                    tb = test_batches[(step // args.eval_interval)
                                      % len(test_batches)]
                    # fetch only the EMA params — the full state (raw params +
                    # Adam moments) is ~3x the traffic and unused by eval_step
                    em = eval_step(jax.device_get(state.ema_params), tb, hp,
                                   eval_plot_dir, eval_wav_dir, step, writer)
                    # persist for 'best'-checkpoint resolution at synthesis time
                    # (round-5 overfit-cliff finding, checkpoint_select.py)
                    checkpoint_select.append_eval_record(
                        save_dir, dict(step=step, teacher_forced_loss=eval_loss,
                                       **em))

            if (getattr(args, 'embedding_interval', 0) and hp.gin_channels > 0 and
                    step % args.embedding_interval == 0 and writer is not None):
                # speaker-embedding projector (reference train.py:327-334)
                try:
                    emb = np.asarray(jax.device_get(
                        state.params['gc_embedding']['embedding']))
                    writer.add_embedding(emb,
                                         metadata=_speaker_names(hp)[:emb.shape[0]],
                                         global_step=step, tag='speaker_embedding')
                except Exception as e:
                    log(f'speaker embedding projection skipped: {e}')

            if (step % args.checkpoint_interval == 0 or
                    step == args.wavenet_train_steps):
                log('\nSaving checkpoint at step {}'.format(step))
                # collective: every process calls save(); orbax writes from the
                # primary host only (see tacotron_train.save_checkpoint_artifacts)
                host_state = jax.device_get(state)
                ckpt.save(step, host_state)
                m = jax.device_get(eval_tf_step(state, mesh_lib.shard_batch(batch, mesh)))
                if lead:
                    save_log(step, batch, m, hp, plot_dir, wav_dir)

        if pending is not None:
            resolve(pending)
            pending = None
        log('WaveNet training complete after {} global steps!'.format(
            args.wavenet_train_steps), slack=True)
        return save_dir
    except Exception as e:
        log('Exiting due to exception: {}'.format(e), slack=True)
        traceback.print_exc()
        raise
    finally:
        batches.close()


def wavenet_train(args, log_dir, hparams, input_path):
    return train(log_dir, args, hparams, input_path)
