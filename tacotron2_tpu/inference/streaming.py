"""Streaming text→speech: yield waveform chunks while the vocoder is still
generating.

The reference's end-to-end path ("world might end first", reference
synthesize.py:84) is monolithic: nothing plays until the whole utterance is
vocoded. Here Tacotron decodes the full mel first — that decode is NOT the long
pole (~tens of ms of device time for seconds of audio; the early-exit chunked
while_loop stops at the stop token) — the mel hands off to the vocoder ON
DEVICE (only the stop-token logits are fetched; conditioning is clipped and
rescaled with jnp ops), and the WaveNet AR kernel then streams the waveform
out in state-carried chunks (ops/pallas/wavenet_ar state carry +
wavenet_trainer.stream_vocode). First audio arrives after the first vocoder
chunk instead of after the whole utterance.

Post-processing is applied per chunk with carried filter state: mu-law inversion
is pointwise, and the preemphasis inverse (an IIR: y[n] = x[n] + k*y[n-1],
reference datasets/audio.py:22-30) carries its one-pole state through
scipy.signal.lfilter's zi, so the concatenated stream equals the non-streaming
output sample-for-sample.
"""

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import lfilter

from ..config import Hparams
from ..ops.mulaw import inv_mulaw, inv_mulaw_quantize, is_mulaw, is_mulaw_quantize
from ..training import wavenet_trainer as wt
from .tacotron_synthesizer import Synthesizer as TacotronSynthesizer
from .wavenet_synthesizer import Synthesizer as WaveNetSynthesizer


@jax.jit
def _clip_rescale(m, lo, hi, clip, rescale):
    m = jnp.where(clip, jnp.clip(m, lo, hi), m)
    return jnp.where(rescale, (m - lo) / (hi - lo), m)


def _prepare_conditions_device(mel, hp: Hparams) -> jnp.ndarray:
    """On-device clip + rescale-to-[0,1] for one (T, num_mels) mel — the
    jnp mirror of WaveNetSynthesizer._prepare_conditions (reference
    synthesizer.py:46-60, feeder.py:319-340) so a device-resident Tacotron
    output never round-trips through the host."""
    lo, hi = ((-hp.max_abs_value, hp.max_abs_value) if hp.symmetric_mels
              else (0.0, hp.max_abs_value))
    m = _clip_rescale(mel, jnp.float32(lo), jnp.float32(hi),
                      bool(hp.clip_for_wavenet), bool(hp.normalize_for_wavenet))
    return m[None].astype(jnp.float32)


class StreamingSynthesizer:
    """Two-stage streaming TTS pipeline (Tacotron → streaming WaveNet)."""

    def load(self, taco_checkpoint_dir: str, wavenet_checkpoint_dir: str,
             hparams: Hparams, wavenet_step=None):
        """wavenet_step: None/'latest', an int step, or 'best' (natural-eval
        checkpoint selection — see training/checkpoint_select.py)."""
        self._hp = hparams.freeze()
        self._taco = TacotronSynthesizer()
        self._taco.load(taco_checkpoint_dir, hparams)
        self._wn = WaveNetSynthesizer()
        self._wn.load(wavenet_checkpoint_dir, hparams, step=wavenet_step)
        # one-time prep (device-resident weights, packed kernel params, jitted
        # conditioning upsampler) so each request pays only per-chunk AR work
        self._get_vocoder()
        return self

    def _get_vocoder(self) -> wt.StreamVocoder:
        if getattr(self, '_vocoder', None) is None:
            self._vocoder = wt.StreamVocoder(self._wn._params, self._hp)
        return self._vocoder

    def stream(self, text: str, seed: int = 0,
               chunk_seconds: float = 0.75,
               first_chunk_seconds: float = 0.20,
               speaker_id: Optional[int] = None) -> Iterator[np.ndarray]:
        """Yield float32 waveform chunks for `text` as they are generated.

        Device handoff: the Tacotron mel never visits the host. Only the
        stop-token logits are fetched (a few KB, they set the output length);
        the mel is sliced on device to a `pad_mel_multiple` frame bucket —
        bounding both the upsampled-conditioning memory and the number of XLA
        programs ever compiled — and conditioned on device. Extra bucket-tail
        frames cost nothing: generation stops at the true sample count."""
        hp = self._hp
        mel, lengths = self._taco.synthesize_to_device([text])
        n_frames = int(lengths[0])
        mult = max(hp.pad_mel_multiple, hp.outputs_per_step)
        bucket = min(int(mel.shape[1]), -(-n_frames // mult) * mult)
        # pad-value tail, not decoder garbage: the conditioning upsampler's
        # receptive field bleeds a few frames backward, and the training feeder
        # pads with the mel floor (reference feeder.py:61-69)
        lo = -hp.max_abs_value if hp.symmetric_mels else 0.0
        mel_b = jnp.where(jnp.arange(bucket)[:, None] < n_frames,
                          mel[0, :bucket], jnp.float32(lo))
        yield from self.stream_from_mel(mel_b, n_frames=n_frames,
                                        seed=seed, chunk_seconds=chunk_seconds,
                                        first_chunk_seconds=first_chunk_seconds,
                                        speaker_id=speaker_id)

    def stream_from_mel(self, mel, n_frames: Optional[int] = None, seed: int = 0,
                        chunk_seconds: float = 0.75,
                        first_chunk_seconds: float = 0.20,
                        speaker_id: Optional[int] = None) -> Iterator[np.ndarray]:
        """Stream waveform chunks for one (T, num_mels) mel.

        `mel` may be a host np.ndarray (prepared on host, exact length) or a
        device jax.Array (clipped/rescaled on device — no host round-trip);
        `n_frames` is the true frame count when the mel carries padding."""
        from ..ops.pallas import wavenet_ar
        hp = self._hp
        step = wavenet_ar.CHUNK
        chunk = max(step, int(chunk_seconds * hp.sample_rate) // step * step)
        first = max(step, int(first_chunk_seconds * hp.sample_rate) // step * step)
        if isinstance(mel, jax.Array) and not isinstance(mel, np.ndarray):
            c = _prepare_conditions_device(mel, hp)
        else:
            c = jnp.asarray(self._wn._prepare_conditions([np.asarray(mel)]))
        g = (jnp.asarray([speaker_id], jnp.int32)
             if speaker_id is not None and hp.gin_channels > 0 else None)
        total = (len(mel) if n_frames is None else n_frames) * hp.get_hop_size()
        emitted = 0
        zi = np.zeros(1)  # inv-preemphasis one-pole state (rest == full-call init)
        for y in self._get_vocoder().stream(jax.random.PRNGKey(seed), c, g,
                                            chunk_samples=chunk,
                                            first_chunk_samples=first):
            y = np.asarray(y[0])
            y = y[:max(0, min(len(y), total - emitted))]  # trim kernel padding
            emitted += len(y)
            if len(y) == 0:
                break  # bucket tail past the true length: nothing left to emit
            if is_mulaw_quantize(hp.input_type):
                w = inv_mulaw_quantize(y, hp.quantize_channels)
            elif is_mulaw(hp.input_type):
                w = inv_mulaw(y, hp.quantize_channels)
            else:
                w = y
            if hp.preemphasize:
                w, zi = lfilter([1.0], [1.0, -hp.preemphasis], w, zi=zi)
            yield np.asarray(w, np.float32)
            if emitted >= total:
                break  # don't generate bucket-tail chunks past the true length
