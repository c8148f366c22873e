"""Tacotron batch inference (reference tacotron/synthesizer.py + tacotron/synthesize.py).

Modes:
  - eval: text sentences → mels (+ linear), Griffin-Lim wavs, plots, eval/map.txt
  - synthesis (GTA or natural): whole train.txt → mel npys + gta/map.txt, the bridge
    that feeds WaveNet training
  - live: REPL synthesis with immediate GL playback artifacts

TPU redesign: one jitted apply per (batch, text-len, mel-len) bucket; no placeholders
or per-GPU split_infos — GSPMD shards the padded batch. Output lengths are recovered
from stop-token predictions (reference synthesizer.py:254-256).
"""

import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Hparams
from ..models.tacotron.model import Tacotron, output_range
from ..ops import audio
from ..ops.dsp_jax import inv_linear_spectrogram_jax, inv_mel_spectrogram_jax
from ..parallel import mesh as mesh_lib
from ..text import text_to_sequence
from ..training.checkpointing import CheckpointManager
from ..training.tacotron_trainer import create_train_state
from ..utils import plot
from ..utils.infolog import log


from ..utils import round_up as _round_up  # noqa: E402


class Synthesizer:
    def __init__(self):
        self._apply_cache = {}

    def load(self, checkpoint_dir: str, hparams: Hparams, gta: bool = False,
             model_name: str = 'Tacotron'):
        log('Constructing model: %s' % model_name)
        self._hp = hparams.freeze()  # jit-cached apply fns key on hparams identity
        self.gta = gta
        self._model = Tacotron(hparams)
        self._mesh = mesh_lib.make_mesh(hparams)
        self._cleaners = [c.strip() for c in hparams.cleaners.split(',')]

        # build a template state to restore into
        dummy = dict(
            inputs=np.zeros((1, 8), np.int32),
            input_lengths=np.ones((1,), np.int32),
            mel_targets=np.zeros((1, hparams.outputs_per_step, hparams.num_mels), np.float32),
        )
        state = create_train_state(hparams, jax.random.PRNGKey(0), dummy)
        ckpt = CheckpointManager(checkpoint_dir)
        step = ckpt.latest_step()
        if step is None:
            raise FileNotFoundError(f'no checkpoint in {checkpoint_dir}')
        state = ckpt.restore(state)
        log('Loading checkpoint: {} (step {})'.format(checkpoint_dir, int(state.step)))
        # orbax restores HOST numpy arrays; pin them on device once, or every
        # jitted call re-uploads the full weight tree (seconds per request on a
        # bandwidth-starved host link — this was the streaming-TTFA long pole)
        self._variables = jax.device_put(
            {'params': state.params, 'batch_stats': state.batch_stats})
        self._pad_value = -hparams.max_abs_value if hparams.symmetric_mels else 0.0

    # ------------------------------------------------------------------
    def _jit_apply(self, gta: bool, max_iters: Optional[int]):
        key = (gta, max_iters)
        if key not in self._apply_cache:
            hp = self._hp

            def fn(variables, inputs, input_lengths, mel_targets, rng):
                return self._model.apply(
                    variables, inputs, input_lengths,
                    mel_targets=mel_targets, max_iters=max_iters,
                    deterministic=True,
                    teacher_forcing_ratio=jnp.float32(1.0) if gta else None,
                    predict_linear=hp.predict_linear and not gta,
                    rngs={'dropout': rng, 'teacher': jax.random.fold_in(rng, 7)})
            self._apply_cache[key] = jax.jit(fn)
        return self._apply_cache[key]

    def _prepare_text_batch(self, texts, mel_filenames=None):
        """Pad the batch to the synthesis batch size by repeating the last sample
        (reference synthesizer.py:81-85) — keeps one static XLA batch shape."""
        hp = self._hp
        bs = hp.tacotron_synthesis_batch_size
        if len(texts) < bs:
            if mel_filenames is not None:
                mel_filenames = list(mel_filenames) + [mel_filenames[-1]] * (bs - len(texts))
            texts = list(texts) + [texts[-1]] * (bs - len(texts))
        seqs = [np.asarray(text_to_sequence(t, self._cleaners), np.int32) for t in texts]
        input_lengths = np.asarray([len(s) for s in seqs], np.int32)
        T_in = _round_up(int(input_lengths.max()), hp.pad_text_multiple)
        inputs = np.stack([np.pad(s, (0, T_in - len(s))) for s in seqs])
        return texts, mel_filenames, inputs, input_lengths

    def synthesize_to_device(self, texts: Sequence[str]):
        """Free-running decode that leaves the mel ON DEVICE.

        The streaming path's handoff to the vocoder: only the (B, T) stop-token
        logits are fetched (a few KB — they determine the output lengths,
        reference synthesizer.py:254); the mel itself is clipped to the model
        output range on device and returned as a `jax.Array`, saving the full
        mel fetch + re-upload round-trip that `synthesize()` pays (the dominant
        pre-vocoder latency term when host↔device bandwidth is scarce).

        Returns (mel, lengths): `mel` is a clipped (batch, T, num_mels) device
        array still padded to the decode length — T is static per hp.max_iters,
        so this compiles exactly once; slice per-utterance with `lengths`.
        """
        hp = self._hp
        rng = jax.random.PRNGKey(hp.tacotron_random_seed)
        n_real = len(texts)
        texts, _, inputs, input_lengths = self._prepare_text_batch(texts)
        out = self._jit_apply(False, hp.max_iters)(
            self._variables, inputs, input_lengths, None, rng)
        lengths = self._get_output_lengths(np.asarray(out['stop_token_prediction']))
        lo, hi = output_range(hp)
        mel = jnp.clip(out['mel_outputs'], lo, hi)
        return mel, lengths[:n_real]

    def synthesize(self, texts: Sequence[str], basenames: Sequence[str],
                   out_dir: Optional[str], log_dir: Optional[str],
                   mel_filenames: Optional[Sequence[str]]):
        """Synthesize a batch. Returns list of saved mel paths (+ speaker ids)."""
        hp = self._hp
        rng = jax.random.PRNGKey(hp.tacotron_random_seed)
        n_real = len(texts)
        texts, mel_filenames, inputs, input_lengths = \
            self._prepare_text_batch(texts, mel_filenames)

        if self.gta:
            assert mel_filenames is not None
            mels = [np.load(f) for f in mel_filenames]
            target_lengths = [len(m) for m in mels]
            T_out = _round_up(_round_up(max(target_lengths), hp.outputs_per_step),
                              _round_up(hp.pad_mel_multiple, hp.outputs_per_step))
            mel_targets = np.stack([
                np.pad(m, [(0, T_out - len(m)), (0, 0)], constant_values=self._pad_value)
                for m in mels]).astype(np.float32)
            out = self._jit_apply(True, None)(
                self._variables, inputs, input_lengths, mel_targets, rng)
        else:
            mel_targets = None
            # full max_iters cap (reference dynamic_decode maximum_iterations,
            # tacotron.py:173); the decoder's chunked while_loop exits as soon as
            # every sequence's stop token fires, so the cap costs nothing
            out = self._jit_apply(False, hp.max_iters)(
                self._variables, inputs, input_lengths, None, rng)

        out = jax.device_get(out)
        mels_out = np.asarray(out['mel_outputs'])
        stop_logits = np.asarray(out['stop_token_prediction'])
        alignments = np.asarray(out['alignments'])
        linears = np.asarray(out['linear_outputs']) if 'linear_outputs' in out else None

        if self.gta:
            out_lengths = target_lengths
        else:
            out_lengths = self._get_output_lengths(stop_logits)

        # clip to model output range (reference synthesizer.py:160)
        lo, hi = output_range(hp)
        mels_out = np.clip(mels_out, lo, hi)

        saved_mels = []
        basenames = basenames[:n_real]  # drop padding replicas
        for i, basename in enumerate(basenames):
            L = int(out_lengths[i])
            mel = mels_out[i][:L]
            if out_dir is not None:
                mel_path = os.path.join(out_dir, 'mel-{}.npy'.format(basename))
                np.save(mel_path, mel, allow_pickle=False)
                saved_mels.append(mel_path)
            else:
                saved_mels.append(mel)

            if log_dir is not None:
                wav = self._invert_mel(mel)
                audio.save_wav(wav, os.path.join(log_dir, 'wavs/wav-{}-mel.wav'.format(basename)),
                               sr=hp.sample_rate)
                plot.plot_alignment(alignments[i][:, :max(1, L // hp.outputs_per_step)],
                                    os.path.join(log_dir, 'plots/alignment-{}.png'.format(basename)),
                                    title='{}'.format(texts[i]), split_title=True,
                                    max_len=None)
                plot.plot_spectrogram(mel, os.path.join(
                    log_dir, 'plots/mel-{}.png'.format(basename)),
                    title='{}'.format(texts[i]), split_title=True)
                if linears is not None:
                    lin = np.clip(linears[i][:L], lo, hi)
                    wav = self._invert_linear(lin)
                    audio.save_wav(wav, os.path.join(
                        log_dir, 'wavs/wav-{}-linear.wav'.format(basename)),
                        sr=hp.sample_rate)
        return saved_mels

    def _invert_mel(self, mel: np.ndarray) -> np.ndarray:
        hp = self._hp
        if hp.GL_on_GPU:
            wav = np.asarray(inv_mel_spectrogram_jax(jnp.asarray(mel.T), hp))
            return audio.inv_preemphasis(wav, hp.preemphasis, hp.preemphasize)
        return audio.inv_mel_spectrogram(mel.T, hp)

    def _invert_linear(self, lin: np.ndarray) -> np.ndarray:
        hp = self._hp
        if hp.GL_on_GPU:
            wav = np.asarray(inv_linear_spectrogram_jax(jnp.asarray(lin.T), hp))
            return audio.inv_preemphasis(wav, hp.preemphasis, hp.preemphasize)
        return audio.inv_linear_spectrogram(lin.T, hp)

    def _get_output_lengths(self, stop_logits: np.ndarray) -> List[int]:
        """First frame whose stop probability exceeds 0.5 (reference synthesizer.py:254)."""
        probs = 1.0 / (1.0 + np.exp(-stop_logits))
        lengths = []
        for row in probs:
            idx = np.where(row > 0.5)[0]
            n = int(idx[0]) + 1 if len(idx) else len(row)
            # floor at a few frames: a 0/1-frame mel makes Griffin-Lim degenerate
            lengths.append(max(n, 4 * self._hp.outputs_per_step))
        return lengths


def run_eval(args, checkpoint_dir, output_dir, hparams, sentences):
    eval_dir = os.path.join(output_dir, 'eval')
    log_dir = os.path.join(output_dir, 'logs-eval')
    os.makedirs(eval_dir, exist_ok=True)
    os.makedirs(os.path.join(log_dir, 'wavs'), exist_ok=True)
    os.makedirs(os.path.join(log_dir, 'plots'), exist_ok=True)

    synth = Synthesizer()
    synth.load(checkpoint_dir, hparams)
    bs = hparams.tacotron_synthesis_batch_size
    log('Starting Synthesis')
    with open(os.path.join(eval_dir, 'map.txt'), 'w', encoding='utf-8') as f:
        for i in range(0, len(sentences), bs):
            start = time.time()
            batch = list(sentences[i:i + bs])
            basenames = ['batch_{}_sentence_{}'.format(i // bs, j) for j in range(len(batch))]
            mel_paths = synth.synthesize(batch, basenames, eval_dir, log_dir, None)
            for text, path in zip(batch, mel_paths):
                f.write('{}|{}\n'.format(text, path))
            log('Synthesized batch {} in {:.3f} sec'.format(i // bs, time.time() - start))
    log('synthesized mel spectrograms at {}'.format(eval_dir))
    return eval_dir


def run_synthesis(args, checkpoint_dir, output_dir, hparams):
    """GTA (or natural) synthesis over the whole training set → gta/map.txt
    (reference tacotron/synthesize.py:74-115)."""
    gta = args.GTA == 'True'
    synth_dir = os.path.join(output_dir, 'gta' if gta else 'natural')
    os.makedirs(synth_dir, exist_ok=True)

    input_dir = args.input_dir if os.path.isabs(args.input_dir) else \
        os.path.join(getattr(args, 'base_dir', ''), args.input_dir)
    metadata_filename = os.path.join(input_dir, 'train.txt')
    with open(metadata_filename, encoding='utf-8') as f:
        metadata = [line.strip().split('|') for line in f]
    frame_shift_ms = hparams.get_hop_size() / hparams.sample_rate
    hours = sum(int(x[4]) for x in metadata) * frame_shift_ms / 3600
    log('Loaded metadata for {} examples ({:.2f} hours)'.format(len(metadata), hours))

    synth = Synthesizer()
    synth.load(checkpoint_dir, hparams, gta=gta)

    bs = hparams.tacotron_synthesis_batch_size
    mel_dir = os.path.join(input_dir, 'mels')
    wav_dir = os.path.join(input_dir, 'audio')

    with open(os.path.join(synth_dir, 'map.txt'), 'w', encoding='utf-8') as f:
        for i in range(0, len(metadata), bs):
            start = time.time()
            rows = metadata[i:i + bs]
            texts = [m[5] for m in rows]
            mel_filenames = [os.path.join(mel_dir, m[1]) for m in rows]
            wav_paths = [os.path.join(wav_dir, m[0]) for m in rows]
            basenames = [os.path.basename(m).replace('.npy', '').replace('mel-', '')
                         for m in mel_filenames]
            out_paths = synth.synthesize(texts, basenames, synth_dir, None, mel_filenames)
            for wav_path, mel_fn, out_path, text in zip(wav_paths, mel_filenames,
                                                        out_paths, texts):
                f.write('{}|{}|{}|{}|{}\n'.format(wav_path, mel_fn, out_path, '<no_g>', text))
            log('Synthesized batch {}/{} in {:.3f} sec'.format(
                i // bs + 1, (len(metadata) + bs - 1) // bs, time.time() - start))
    log('synthesized mel spectrograms at {}'.format(synth_dir))
    return os.path.join(synth_dir, 'map.txt')


def play_audio(wav_path: str) -> bool:
    """Best-effort playback of a wav file through the OS audio stack (the reference
    pipes raw samples to an OS player in live mode, tacotron/synthesizer.py:162-182).

    Tries the `sounddevice` package first, then common CLI players. Returns True if
    something played; callers fall back to just reporting the file path."""
    try:
        import sounddevice as sd
        import numpy as np
        from scipy.io import wavfile
        sr, data = wavfile.read(wav_path)
        if data.dtype.kind == 'i':
            data = data.astype(np.float32) / np.iinfo(data.dtype).max
        sd.play(data, sr, blocking=True)
        return True
    except Exception:
        pass
    import shutil
    import subprocess
    for player in (['aplay', wav_path], ['afplay', wav_path],
                   ['ffplay', '-nodisp', '-autoexit', '-loglevel', 'quiet', wav_path]):
        if shutil.which(player[0]):
            try:
                subprocess.run(player, check=True, timeout=120,
                               stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
                return True
            except Exception:
                continue
    return False


def run_live(args, checkpoint_dir, hparams):
    """Interactive REPL synthesis (reference tacotron/synthesize.py:87-102)."""
    synth = Synthesizer()
    synth.load(checkpoint_dir, hparams)
    out_dir = os.path.join(args.base_dir, 'live_out')
    os.makedirs(os.path.join(out_dir, 'wavs'), exist_ok=True)
    os.makedirs(os.path.join(out_dir, 'plots'), exist_ok=True)
    log('Live synthesis — enter text, ctrl-D to exit')
    i = 0
    try:
        while True:
            text = input('> ')
            if not text.strip():
                continue
            synth.synthesize([text], [f'live_{i}'], None, out_dir, None)
            wav_path = '{}/wavs/wav-live_{}-mel.wav'.format(out_dir, i)
            log('wrote {}'.format(wav_path))
            if not play_audio(wav_path):
                log('(no audio device/player available — wav saved only)')
            i += 1
    except EOFError:
        log('live session done')


def tacotron_synthesize(args, hparams, checkpoint, sentences=None):
    output_dir = os.path.join(getattr(args, 'base_dir', ''), 'tacotron_' + args.output_dir)
    if args.mode == 'eval':
        return run_eval(args, checkpoint, output_dir, hparams, sentences)
    elif args.mode == 'synthesis':
        return run_synthesis(args, checkpoint, output_dir, hparams)
    else:
        return run_live(args, checkpoint, hparams)
