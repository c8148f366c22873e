#!/usr/bin/env python
"""Drive the paper profile (config.paper_hparams — reference paper_hparams.py:
24 layers / 4 stacks / MoL-30 / 2D upsample / no linear, the profile the
reference README leads with) at FULL SIZE on the chip.

Measures, mirroring the default-profile tables in docs/round*/RESULTS.md:
  1. Tacotron train step (paper deltas: clip_outputs off, no linear post-net)
  2. WaveNet train step (24xMoL-30, 2D upsample)
  3. WaveNet AR generation through the Pallas kernel (MoL sampling path)

Usage: python scripts/dev_paper_profile.py  (chip otherwise idle)
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
from tacotron2_tpu.utils.runtime import setup_runtime
setup_runtime()

from tacotron2_tpu.config import paper_hparams


def taco_train(hp, B=32, Tin=128, Tout=512, n=6):
    from tacotron2_tpu.training import tacotron_trainer as tt
    hp = hp.replace(fused_decoder=True, decoder_scan_unroll=4)
    rng = jax.random.PRNGKey(0)
    batch = dict(
        inputs=jax.random.randint(rng, (B, Tin), 2, 60),
        input_lengths=jnp.full((B,), Tin, jnp.int32),
        mel_targets=jax.random.uniform(rng, (B, Tout, hp.num_mels),
                                       minval=-4., maxval=4.),
        stop_token_targets=jnp.zeros((B, Tout), jnp.float32),
        targets_lengths=jnp.full((B,), Tout, jnp.int32))
    state = tt.create_train_state(hp, rng, batch, dtype=jnp.bfloat16)
    step = jax.jit(partial(tt.train_step, hp=hp, dtype=jnp.bfloat16),
                   donate_argnums=(0,))
    state, m = step(state, batch, rng)
    float(m['loss'])
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, batch, rng)
    float(m['loss'])
    dt = (time.time() - t0) / n
    return dict(ms_per_step=round(dt * 1e3, 1),
                frames_per_sec=round(B * Tout / dt, 1), batch=B)


def wavenet_train(hp, B=8, n=6):
    from tacotron2_tpu.training import wavenet_trainer as wt
    T = hp.max_time_steps - hp.max_time_steps % hp.get_hop_size()
    Tc = T // hp.get_hop_size()
    rng = jax.random.PRNGKey(0)
    batch = dict(
        audio=jax.random.uniform(rng, (B, T), minval=-0.5, maxval=0.5),
        input_lengths=jnp.full((B,), T, jnp.int32),
        mel_conditions=jax.random.uniform(rng, (B, Tc, hp.num_mels)))
    state = wt.create_train_state(hp, rng, batch)
    step = jax.jit(partial(wt.train_step, hp=hp, dtype=jnp.bfloat16),
                   donate_argnums=(0,))
    state, m = step(state, batch, rng)
    float(m['loss'])
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, batch, rng)
    float(m['loss'])
    dt = (time.time() - t0) / n
    return dict(ms_per_step=round(dt * 1e3, 1),
                samples_per_sec=round(B * T / dt, 1), batch=B,
                loss=round(float(m['loss']), 3))


def wavenet_ar_gen(hp, B=8, secs=2.0):
    from tacotron2_tpu.ops.pallas import wavenet_ar
    from tacotron2_tpu.training import wavenet_trainer as wt
    assert wavenet_ar.supports(hp), 'AR kernel must admit the paper profile'
    T = int(secs * hp.sample_rate) // 128 * 128
    hop = hp.get_hop_size()
    rng = np.random.default_rng(0)
    batch = dict(audio=np.zeros((1, hop), np.float32),
                 input_lengths=np.asarray([hop], np.int32),
                 mel_conditions=np.zeros((1, 1, hp.num_mels), np.float32))
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    weights = wavenet_ar.pack_params(state.params, hp)
    c_up = jnp.asarray(rng.uniform(0, 1, (B, T, hp.cin_channels)), jnp.float32)
    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), B, T)
    audio, _ = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                      return_params=False)
    a = np.asarray(audio)
    assert np.isfinite(a).all()
    best = float('inf')
    for _ in range(5):
        t0 = time.time()
        audio, _ = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                          return_params=False)
        np.asarray(audio)
        best = min(best, time.time() - t0)
    return dict(us_per_step=round(best * 1e6 / T, 2),
                samples_per_sec=round(B * T / best, 1), batch=B, steps=T)


def main():
    hp = paper_hparams()
    out = {}
    out['wavenet_ar_b8'] = wavenet_ar_gen(hp, B=8)
    print('ar:', out['wavenet_ar_b8'], flush=True)
    out['wavenet_train_b8'] = wavenet_train(hp, B=8)
    print('wn train:', out['wavenet_train_b8'], flush=True)
    out['tacotron_train_b32'] = taco_train(hp, B=32)
    print('taco train:', out['tacotron_train_b32'], flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
