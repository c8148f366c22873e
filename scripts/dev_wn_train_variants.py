#!/usr/bin/env python
"""Measure WaveNet train-step variants on the chip: batch {8, 32} x
remat {off, on} (plus the u16-dropout change already in the model).
Usage: python scripts/dev_wn_train_variants.py  (chip otherwise idle)"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
from tacotron2_tpu.utils.runtime import setup_runtime
setup_runtime()

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.training import wavenet_trainer as wt


def measure(hp, B, n=8):
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
    loss0 = float(m['loss'])
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, batch, rng)
    float(m['loss'])
    dt = (time.time() - t0) / n
    return dt, B * T / dt, loss0


def main():
    for remat in (False, True):
        for B in (8, 32):
            hp = default_hparams().replace(wavenet_remat=remat)
            dt, sps, loss0 = measure(hp, B)
            print(f'remat={remat!s:5s} B={B:3d}: {dt*1e3:7.1f} ms/step  '
                  f'{sps/1e6:.2f}M samples/s  (loss0={loss0:.3f})', flush=True)


if __name__ == '__main__':
    main()
