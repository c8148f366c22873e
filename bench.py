#!/usr/bin/env python
"""Benchmark driver: Tacotron training throughput on the available accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no benchmark numbers (BASELINE.md: "published": {}), so
vs_baseline is reported as 1.0 (self-relative); the absolute value is the tracked
quantity. Metric: mel frames/sec through the full default-size Tacotron train step
(batch 32 — the reference's default per-GPU batch, hparams.py:245) with bfloat16
compute on TPU.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def main():
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.training import tacotron_trainer as tt

    hp = default_hparams()
    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform != 'cpu' else jnp.float32
    if platform == 'cpu':
        # keep the CPU fallback tractable
        hp.parse('enc_conv_channels=64,decoder_lstm_units=64,postnet_channels=64,'
                 'encoder_lstm_units=32,attention_dim=32,prenet_layers=[32,32],'
                 'cbhg_conv_channels=32,cbhg_projection=64,cbhg_highway_units=32,'
                 'cbhg_rnn_units=32')
        B, Tin, Tout, steps = 8, 48, 128, 4
    else:
        B, Tin, Tout, steps = 32, 160, 512, 10

    rng = jax.random.PRNGKey(0)
    batch = dict(
        inputs=jax.random.randint(rng, (B, Tin), 2, 60),
        input_lengths=jnp.full((B,), Tin, jnp.int32),
        mel_targets=jax.random.uniform(rng, (B, Tout, hp.num_mels), minval=-4.0, maxval=4.0),
        stop_token_targets=jnp.zeros((B, Tout), jnp.float32),
        targets_lengths=jnp.full((B,), Tout, jnp.int32),
        linear_targets=jax.random.uniform(rng, (B, Tout, hp.num_freq), minval=-4.0, maxval=4.0),
    )

    state = tt.create_train_state(hp, rng, batch, dtype=dtype)
    step_fn = jax.jit(partial(tt.train_step, hp=hp, dtype=dtype), donate_argnums=(0,))

    # warmup / compile. NOTE: host fetch (float()) rather than block_until_ready —
    # the experimental axon platform returns from block_until_ready before remote
    # execution completes, which silently inflates throughput ~50x.
    state, metrics = step_fn(state, batch, rng)
    float(metrics['loss'])
    state, metrics = step_fn(state, batch, rng)
    float(metrics['loss'])

    t0 = time.time()
    for _ in range(steps):
        state, metrics = step_fn(state, batch, rng)
    assert np.isfinite(float(metrics['loss']))
    elapsed = time.time() - t0

    frames_per_sec = B * Tout * steps / elapsed
    print(json.dumps({
        'metric': 'tacotron_train_mel_frames_per_sec',
        'value': round(frames_per_sec, 2),
        'unit': 'mel_frames/sec',
        'vs_baseline': 1.0,
    }))


if __name__ == '__main__':
    main()
