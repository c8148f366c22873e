#!/usr/bin/env python
"""Measure the full-size Tacotron train step (batch 32 x 512 frames, bf16) with and
without the fused custom-VJP decoder. Run on the TPU dev box from the repo root."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, '.')
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.training import tacotron_trainer as tt

    B, Tin, Tout = 32, 128, 512
    if '--scale' in sys.argv:
        # batch-amortized throughput: the decoder's per-step weight traffic
        # (~33 MB x 512 scan steps) is batch-invariant, so larger batches should
        # raise frames/sec at similar wall time until FLOPs/VMEM bind
        scale_batches(Tin, Tout, batches=(32, 64, 128))
        return
    results = {}
    if '--fused-only' in sys.argv:
        variants = [(True, 'fused_decoder=True')]
    else:
        variants = [(False, 'fused_decoder=False'), (True, 'fused_decoder=True')]
    for fused, hstr in variants:
        hp = default_hparams()
        hp.parse(hstr + ',decoder_scan_unroll=4')
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
        t0 = time.time()
        state, m = step(state, batch, rng)
        loss = float(m['loss'])  # host fetch = fence (axon block_until_ready lies)
        print(f'fused={fused}: compile+first step {time.time()-t0:.1f}s loss={loss:.4f}')
        times = []
        for i in range(6):
            t0 = time.time()
            state, m = step(state, batch, rng)
            loss = float(m['loss'])
            times.append(time.time() - t0)
        best = min(times)
        results[fused] = best
        print(f'fused={fused}: train step {best*1000:.1f} ms  (loss {loss:.4f})')
        # pipelined steady-state: dispatch N steps, fence once — what the
        # (one-step-pipelined) training loop actually achieves; the fenced
        # number above includes a full host round-trip per step
        n_pipe = 10
        t0 = time.time()
        for _ in range(n_pipe):
            state, m = step(state, batch, rng)
        loss = float(m['loss'])
        print(f'fused={fused}: pipelined {1000*(time.time()-t0)/n_pipe:.1f} '
              f'ms/step over {n_pipe} steps (loss {loss:.4f})')

        if '--split' in sys.argv:
            # forward-only timing to locate the fwd/bwd split
            from tacotron2_tpu.models.tacotron.losses import compute_losses
            from tacotron2_tpu.models.tacotron.model import Tacotron
            model = Tacotron(hp, dtype=jnp.bfloat16)

            @jax.jit
            def fwd_only(params, batch_stats, batch, rng):
                rngs = {'dropout': rng, 'zoneout': jax.random.fold_in(rng, 1),
                        'teacher': jax.random.fold_in(rng, 2)}
                out, _ = model.apply({'params': params, 'batch_stats': batch_stats},
                                     batch['inputs'], batch['input_lengths'],
                                     mel_targets=batch['mel_targets'],
                                     deterministic=False,
                                     teacher_forcing_ratio=jnp.float32(1.0),
                                     rngs=rngs, mutable=['batch_stats'])
                total, _ = compute_losses(out, batch, params, hp)
                return total
            t0 = time.time()
            float(fwd_only(state.params, state.batch_stats, batch, rng))
            print(f'  fwd-only compile {time.time()-t0:.1f}s')
            ts = []
            for _ in range(5):
                t0 = time.time()
                float(fwd_only(state.params, state.batch_stats, batch, rng))
                ts.append(time.time() - t0)
            print(f'  fwd-only {min(ts)*1000:.1f} ms')
    if len(results) == 2:
        print(f'speedup: {results[False]/results[True]:.2f}x '
              f'({results[False]*1000:.1f} -> {results[True]*1000:.1f} ms)')


def scale_batches(Tin, Tout, batches):
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.training import tacotron_trainer as tt

    base = None
    for B in batches:
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
        t0 = time.time()
        state, m = step(state, batch, rng)
        float(m['loss'])
        print(f'B={B:4d}: compile+first step {time.time()-t0:.1f}s')
        n_pipe = 10
        t0 = time.time()
        for _ in range(n_pipe):
            state, m = step(state, batch, rng)
        float(m['loss'])
        ms = 1000 * (time.time() - t0) / n_pipe
        fps = B * Tout / (ms / 1000)
        if base is None:
            base = (B, ms, fps)
        print(f'B={B:4d}: pipelined {ms:.1f} ms/step, {fps:,.0f} mel frames/s '
              f'({fps / base[2]:.2f}x frames/s, {ms / base[1]:.2f}x time vs B={base[0]})')


if __name__ == '__main__':
    main()
