"""Streaming text→speech: yield waveform chunks while the vocoder is still
generating.

The reference's end-to-end path ("world might end first", reference
synthesize.py:84) is monolithic: nothing plays until the whole utterance is
vocoded. Here Tacotron decodes the full mel first — that decode is NOT the long
pole (~tens of ms of device time for seconds of audio; the early-exit chunked
while_loop stops at the stop token) — and the WaveNet AR kernel then streams the
waveform out in state-carried chunks (ops/pallas/wavenet_ar state carry +
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


class StreamingSynthesizer:
    """Two-stage streaming TTS pipeline (Tacotron → streaming WaveNet)."""

    def load(self, taco_checkpoint_dir: str, wavenet_checkpoint_dir: str,
             hparams: Hparams):
        self._hp = hparams.freeze()
        self._taco = TacotronSynthesizer()
        self._taco.load(taco_checkpoint_dir, hparams)
        self._wn = WaveNetSynthesizer()
        self._wn.load(wavenet_checkpoint_dir, hparams)
        return self

    def stream(self, text: str, seed: int = 0,
               chunk_seconds: float = 0.75,
               first_chunk_seconds: float = 0.20,
               speaker_id: Optional[int] = None) -> Iterator[np.ndarray]:
        """Yield float32 waveform chunks for `text` as they are generated."""
        hp = self._hp
        mel = self._taco.synthesize([text], ['stream'], None, None, None)[0]
        yield from self.stream_from_mel(mel, seed=seed,
                                        chunk_seconds=chunk_seconds,
                                        first_chunk_seconds=first_chunk_seconds,
                                        speaker_id=speaker_id)

    def stream_from_mel(self, mel: np.ndarray, seed: int = 0,
                        chunk_seconds: float = 0.75,
                        first_chunk_seconds: float = 0.20,
                        speaker_id: Optional[int] = None) -> Iterator[np.ndarray]:
        from ..ops.pallas import wavenet_ar
        hp = self._hp
        step = wavenet_ar.CHUNK
        chunk = max(step, int(chunk_seconds * hp.sample_rate) // step * step)
        first = max(step, int(first_chunk_seconds * hp.sample_rate) // step * step)
        c = jnp.asarray(self._wn._prepare_conditions([mel]))
        g = (jnp.asarray([speaker_id], jnp.int32)
             if speaker_id is not None and hp.gin_channels > 0 else None)
        total = len(mel) * hp.get_hop_size()
        emitted = 0
        zi = np.zeros(1)  # inv-preemphasis one-pole state (rest == full-call init)
        for y in wt.stream_vocode(self._wn._params, hp, jax.random.PRNGKey(seed),
                                  c, g, chunk_samples=chunk,
                                  first_chunk_samples=first):
            y = np.asarray(y[0])
            y = y[:max(0, min(len(y), total - emitted))]  # trim kernel padding
            emitted += len(y)
            if len(y) == 0:
                continue
            if is_mulaw_quantize(hp.input_type):
                w = inv_mulaw_quantize(y, hp.quantize_channels)
            elif is_mulaw(hp.input_type):
                w = inv_mulaw(y, hp.quantize_channels)
            else:
                w = y
            if hp.preemphasize:
                w, zi = lfilter([1.0], [1.0, -hp.preemphasis], w, zi=zi)
            yield np.asarray(w, np.float32)
