"""Streaming device-handoff parity: the on-device conditioning prep and the
bucketed-mel + n_frames trimming must reproduce the host path exactly.

The device handoff (inference/streaming.py) keeps the Tacotron mel on device:
conditioning is clipped/rescaled with jnp ops instead of
WaveNetSynthesizer._prepare_conditions, the mel is padded to a frame bucket,
and generation stops at the true sample count. Same math, same audio.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.inference.streaming import (StreamingSynthesizer,
                                               _prepare_conditions_device)
from tacotron2_tpu.inference.wavenet_synthesizer import Synthesizer as WaveNetSynthesizer
from tacotron2_tpu.training import wavenet_trainer as wt

TINY = ("layers=4,stacks=2,residual_channels=8,gate_channels=16,skip_out_channels=8,"
        "upsample_scales=[4,8],hop_size=32,win_size=128,n_fft=256,num_freq=129,"
        "cin_channels=80,out_channels=2")


def _shell(hp):
    """StreamingSynthesizer without checkpoints: fabricate the loaded state."""
    batch = dict(audio=np.zeros((1, 32), np.float32),
                 input_lengths=np.asarray([32], np.int32),
                 mel_conditions=np.zeros((1, 1, 80), np.float32))
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    wn = WaveNetSynthesizer.__new__(WaveNetSynthesizer)
    wn._hp = hp
    wn._params = state.params
    ss = StreamingSynthesizer.__new__(StreamingSynthesizer)
    ss._hp = hp
    ss._wn = wn
    return ss


def test_device_conditioning_matches_host():
    hp = default_hparams()
    hp.parse(TINY)
    hp.freeze()
    ss = _shell(hp)
    rng = np.random.default_rng(3)
    mel = rng.uniform(-1.2 * hp.max_abs_value, 1.2 * hp.max_abs_value,
                      (10, 80)).astype(np.float32)  # excursions exercise the clip
    host = ss._wn._prepare_conditions([mel])
    dev = np.asarray(_prepare_conditions_device(jnp.asarray(mel), hp))
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_stream_from_mel_device_matches_host():
    """Bucket-padded device mel + n_frames == host mel, chunk for chunk."""
    hp = default_hparams()
    hp.parse(TINY)
    hp.freeze()
    ss = _shell(hp)
    hop = hp.get_hop_size()
    L, bucket = 8, 12  # total 256 samples = 2 kernel chunks; 4 pad-tail frames
    rng = np.random.default_rng(4)
    mel = rng.uniform(-hp.max_abs_value, hp.max_abs_value, (bucket, 80)).astype(np.float32)
    lo = -hp.max_abs_value if hp.symmetric_mels else 0.0
    mel[L:] = lo  # bucket tail at the feeder pad value (stream() does this on device)

    kw = dict(n_frames=L, seed=11, chunk_seconds=128 / hp.sample_rate,
              first_chunk_seconds=128 / hp.sample_rate)
    host_chunks = list(ss.stream_from_mel(mel, **kw))
    dev_chunks = list(ss.stream_from_mel(jnp.asarray(mel), **kw))

    assert [len(c) for c in host_chunks] == [len(c) for c in dev_chunks]
    assert sum(len(c) for c in dev_chunks) == L * hop  # stops at the true length
    np.testing.assert_allclose(np.concatenate(dev_chunks),
                               np.concatenate(host_chunks), atol=1e-5)
