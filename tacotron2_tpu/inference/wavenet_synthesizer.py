"""WaveNet batch synthesis (reference wavenet_vocoder/{synthesizer,synthesize}.py).

Loads EMA weights, consumes either a Tacotron-2 map.txt or a directory of mel npys,
clips + renormalizes conditioning like the training feeder, generates autoregressively
(scan over samples with ring-buffer carries), trims to mel_len*hop, writes wavs,
waveplots, and an output map.txt."""

import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Hparams
from ..ops import audio
from ..ops.mulaw import inv_mulaw, inv_mulaw_quantize, is_mulaw, is_mulaw_quantize
from ..training import checkpoint_select
from ..training import wavenet_trainer as wt
from ..training.checkpointing import CheckpointManager
from ..utils import plot
from ..utils.infolog import log



class Synthesizer:
    def load(self, checkpoint_dir: str, hparams: Hparams, step=None):
        """step: None/'latest' (reference behavior), an int step, or 'best' —
        resolve from the train loop's natural-eval history (checkpoint_select;
        the round-5 AR-conditioning overfit cliff makes blind-latest unsafe)."""
        self._hp = hparams.freeze()  # jit-cached generate fns key on hparams identity
        hop = hparams.get_hop_size()
        dummy = dict(
            audio=(np.zeros((1, hop), np.int32) if is_mulaw_quantize(hparams.input_type)
                   else np.zeros((1, hop), np.float32)),
            input_lengths=np.asarray([hop], np.int32),
        )
        if hparams.cin_channels > 0:
            dummy['mel_conditions'] = np.zeros((1, 1, hparams.cin_channels), np.float32)
        if hparams.gin_channels > 0:
            dummy['speaker_ids'] = np.zeros((1,), np.int32)
        state = wt.create_train_state(hparams, jax.random.PRNGKey(0), dummy)
        ckpt = CheckpointManager(checkpoint_dir)
        if ckpt.latest_step() is None:
            raise FileNotFoundError(f'no checkpoint in {checkpoint_dir}')
        if step == 'best':
            resolved = checkpoint_select.resolve_best_checkpoint(
                checkpoint_dir, ckpt.all_steps())
            if resolved is None:
                log('No natural-eval history next to {} — falling back to the '
                    'latest checkpoint'.format(checkpoint_dir))
                step = None
            else:
                step, reason = resolved
                log('Selected WaveNet checkpoint step {} by natural eval: {}'.format(
                    step, reason))
        elif step in (None, 'latest'):
            step = None
        else:
            step = int(step)
        state = ckpt.restore(state, step=step)
        log('Loaded WaveNet checkpoint at step {} (EMA weights)'.format(int(state.step)))
        # pin on device: orbax restores host numpy, and re-uploading the weight
        # tree per generate/pack call dominates request latency on a slow link
        self._params = jax.device_put(state.ema_params)

    def _prepare_conditions(self, mels: Sequence[np.ndarray]):
        """Clip + rescale to [0,1] + pad, like the training feeder
        (reference synthesizer.py:46-60, feeder.py:319-340)."""
        hp = self._hp
        lo, hi = ((-hp.max_abs_value, hp.max_abs_value) if hp.symmetric_mels
                  else (0.0, hp.max_abs_value))
        max_frames = max(len(m) for m in mels)
        out = []
        for m in mels:
            if hp.clip_for_wavenet:
                m = np.clip(m, lo, hi)
            m = np.pad(m, [(0, max_frames - len(m)), (0, 0)], constant_values=lo)
            out.append(m)
        c = np.stack(out).astype(np.float32)
        if hp.normalize_for_wavenet:
            c = ((c - lo) / (hi - lo)).astype(np.float32)
        return c

    def synthesize(self, mel_spectrograms: Sequence[np.ndarray],
                   speaker_ids: Optional[Sequence[int]], basenames: Sequence[str],
                   out_dir: str, log_dir: Optional[str]) -> List[str]:
        hp = self._hp
        hop = hp.get_hop_size()
        lengths = [len(m) * hop for m in mel_spectrograms]
        c = jnp.asarray(self._prepare_conditions(mel_spectrograms))
        g = jnp.asarray(np.asarray(speaker_ids, np.int32)) if speaker_ids is not None else None

        targets = None
        if hp.wavenet_synth_debug:
            # teacher-forced debug generation against known wavs
            # (reference hparams.py:370-372, synthesizer.py:83-94)
            debug_wavs = [np.load(p) for p in hp.wavenet_debug_wavs]
            T = int(c.shape[1]) * hop
            tgt = np.zeros((int(c.shape[0]), T), np.float32)
            for i, w in enumerate(debug_wavs[:int(c.shape[0])]):
                n = min(len(w), T)
                tgt[i, :n] = np.asarray(w, np.float32)[:n]
            targets = jnp.asarray(tgt)

        start = time.time()
        out = wt.generate(self._params, hp, jax.random.PRNGKey(hp.wavenet_random_seed),
                          c, g, targets=targets, return_params=False)
        generated = np.asarray(out['audio'])
        elapsed = time.time() - start
        total = sum(lengths)
        log('Generated {} samples in {:.3f} sec ({:.1f} samples/sec)'.format(
            total, elapsed, total / max(elapsed, 1e-6)))

        paths = []
        for i, basename in enumerate(basenames):
            y = generated[i][:lengths[i]]
            if is_mulaw_quantize(hp.input_type):
                wav = inv_mulaw_quantize(y, hp.quantize_channels)
            elif is_mulaw(hp.input_type):
                wav = inv_mulaw(y, hp.quantize_channels)
            else:
                wav = y
            path = os.path.join(out_dir, f'wav-{basename}.wav')
            audio.save_wavenet_wav(wav, path, hp.sample_rate, hp.preemphasize, hp.preemphasis)
            paths.append(path)
            if log_dir is not None:
                plot.waveplot(os.path.join(log_dir, f'waveplot-{basename}.png'),
                              wav, None, hp)
        return paths


def resolve_mels_input(mels_input):
    """(texts, mel_files) from a map.txt path, a dir (with or without map.txt),
    or a list of mel files. A dir containing map.txt is read as a map so the
    text column survives (an eval dir passed as --mels_dir used to lose it)."""
    if (isinstance(mels_input, str) and os.path.isdir(mels_input)
            and not os.path.isfile(os.path.join(mels_input, 'map.txt'))):
        # bare dir of mel npys (no texts available)
        mel_files = [os.path.join(mels_input, f) for f in sorted(os.listdir(mels_input))
                     if f.endswith('.npy')]
        return [''] * len(mel_files), mel_files
    map_file = mels_input if isinstance(mels_input, str) else None
    if map_file is None or not os.path.isfile(map_file):
        # eval dir containing map.txt
        map_file = os.path.join(mels_input, 'map.txt')
    rows = [l.strip().split('|') for l in open(map_file, encoding='utf-8')]
    map_dir = os.path.dirname(os.path.abspath(map_file))

    def _resolve(p):
        # map rows may carry bare filenames (wavenet_preprocess.py writes them
        # relative to its out_dir layout) — resolve against the map's own dir
        if os.path.isabs(p) or os.path.exists(p):
            return p
        for cand in (os.path.join(map_dir, p), os.path.join(map_dir, 'mels', p)):
            if os.path.exists(cand):
                return cand
        return p

    # eval map: text|mel_path ; gta map: wav|gt_mel|gta_mel|g|text ;
    # wavenet_preprocess map: audio|mel|mel|g|timesteps|mel_frames (no text col)
    if len(rows[0]) == 2:
        return [r[0] for r in rows], [_resolve(r[1]) for r in rows]
    if len(rows[0]) >= 6 and rows[0][4].isdigit() and rows[0][5].isdigit():
        return [''] * len(rows), [_resolve(r[1]) for r in rows]
    return [r[-1] for r in rows], [_resolve(r[2]) for r in rows]


def run_synthesis(args, checkpoint_dir: str, output_dir: str, hparams: Hparams,
                  mels_input):
    """mels_input: a map.txt path, a dir of mel npys, or a list of mel files."""
    wav_dir = os.path.join(output_dir, 'wavs')
    plot_dir = os.path.join(output_dir, 'plots')
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(plot_dir, exist_ok=True)

    texts, mel_files = resolve_mels_input(mels_input)

    speaker_ids = None
    if getattr(args, 'speaker_id', None) is not None:
        speaker_ids = [int(s) for s in args.speaker_id.split(',')]
        assert len(speaker_ids) == len(mel_files)

    synth = Synthesizer()
    synth.load(checkpoint_dir, hparams,
               step=getattr(args, 'wavenet_checkpoint_step', None))

    bs = hparams.wavenet_synthesis_batch_size
    log('Starting synthesis! (this will take a while..)')
    with open(os.path.join(output_dir, 'map.txt'), 'w', encoding='utf-8') as f:
        for i in range(0, len(mel_files), bs):
            files = mel_files[i:i + bs]
            mels = [np.load(p) for p in files]
            basenames = [os.path.basename(p).replace('.npy', '').replace('mel-', '')
                         for p in files]
            sids = speaker_ids[i:i + bs] if speaker_ids is not None else None
            paths = synth.synthesize(mels, sids, basenames, wav_dir, plot_dir)
            for mel_path, wav_path, text in zip(files, paths, texts[i:i + bs]):
                f.write('{}|{}|{}\n'.format(text, mel_path, wav_path))
    log('synthesized audio waveforms at {}'.format(wav_dir))
    return output_dir


def wavenet_synthesize(args, hparams, checkpoint, mels_input=None):
    output_dir = os.path.join(args.base_dir, 'wavenet_output')
    if mels_input is None:
        mels_input = args.mels_dir
    if (isinstance(mels_input, str) and not os.path.isabs(mels_input)
            and not os.path.exists(mels_input)):
        mels_input = os.path.join(args.base_dir, mels_input)
    return run_synthesis(args, checkpoint, output_dir, hparams, mels_input)
