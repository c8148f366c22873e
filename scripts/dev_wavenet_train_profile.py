#!/usr/bin/env python
"""Capture an xplane trace of the full-size WaveNet train step at a given batch
(default 8) to explain the b8->b32 throughput curve (BENCH extras). Usage:
python scripts/dev_wavenet_train_profile.py [B] [outdir]."""

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
    from tacotron2_tpu.training import wavenet_trainer as wt

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    outdir = sys.argv[2] if len(sys.argv) > 2 else f'/tmp/wn_train_prof_b{B}'
    hp = default_hparams()
    T = hp.max_time_steps - hp.max_time_steps % hp.get_hop_size()  # 10725
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
    for _ in range(4):
        state, m = step(state, batch, rng)
    float(m['loss'])
    dt = (time.time() - t0) / 4
    print(f'B={B}: steady step {1000*dt:.1f} ms ({B*T/dt/1e6:.2f}M samples/s)')
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state, m = step(state, batch, rng)
    float(m['loss'])
    jax.profiler.stop_trace()
    print(f'trace written to {outdir}')


if __name__ == '__main__':
    main()
