#!/usr/bin/env python
"""Capture an xplane trace of the full-size Tacotron train step at a given batch
(default 128) to explain the batch-scaling curve (scripts/bench_train_step.py
--scale). Usage: python scripts/dev_taco_train_profile.py [B] [outdir]."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, '.')
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.training import tacotron_trainer as tt

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    outdir = sys.argv[2] if len(sys.argv) > 2 else f'/tmp/taco_train_prof_b{B}'
    Tin, Tout = 128, 512
    hp = default_hparams()
    hp.parse('fused_decoder=True,decoder_scan_unroll=4')
    rng = jax.random.PRNGKey(0)
    batch = dict(
        inputs=jax.random.randint(rng, (B, Tin), 2, 60),
        input_lengths=jnp.full((B,), Tin, jnp.int32),
        mel_targets=jax.random.uniform(rng, (B, Tout, hp.num_mels),
                                       minval=-4., maxval=4.),
        stop_token_targets=jnp.zeros((B, Tout), jnp.float32),
        targets_lengths=jnp.full((B,), Tout, jnp.int32),
        linear_targets=jax.random.uniform(rng, (B, Tout, hp.num_freq),
                                          minval=-4., maxval=4.))
    state = tt.create_train_state(hp, rng, batch, dtype=jnp.bfloat16)
    step = jax.jit(partial(tt.train_step, hp=hp, dtype=jnp.bfloat16),
                   donate_argnums=(0,))
    state, m = step(state, batch, rng)
    float(m['loss'])
    t0 = time.time()
    state, m = step(state, batch, rng)
    float(m['loss'])
    print(f'B={B}: steady step {1000*(time.time()-t0):.1f} ms (fenced)')
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state, m = step(state, batch, rng)
    float(m['loss'])
    jax.profiler.stop_trace()
    print(f'trace written to {outdir}')


if __name__ == '__main__':
    main()
