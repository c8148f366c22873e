#!/usr/bin/env python
"""Probe host-RSS growth per training step on real data (OOM diagnosis).

Runs N steps of the exact train-loop data path (dataset → shard_batch →
train_step) and prints RSS + jax.live_arrays() count every K steps. If
live_arrays grows, the repo holds references; if RSS grows while live_arrays is
flat, the leak is below JAX (e.g. the axon client mirroring transferred
buffers).

Usage: python scripts/dev_leak_probe.py /tmp/soak/training_data/train.txt [N]
"""

import gc
import sys
from functools import partial

import jax
import numpy as np


def rss_mb() -> float:
    with open('/proc/self/status') as f:
        for line in f:
            if line.startswith('VmRSS'):
                return int(line.split()[1]) / 1024
    return -1.0


def main():
    sys.path.insert(0, '.')
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.data.loader import TacotronDataset
    from tacotron2_tpu.parallel import mesh as mesh_lib
    from tacotron2_tpu.training import tacotron_trainer as tt

    meta = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    hp = default_hparams()
    hp.parse('predict_linear=False,pad_mel_multiple=256,pad_text_multiple=64,'
             'tacotron_test_size=None,tacotron_test_batches=10'
             + (',' + sys.argv[3] if len(sys.argv) > 3 else ''))
    ds = TacotronDataset(meta, hp)
    mesh = mesh_lib.make_mesh(hp)
    it = ds.train_batches(seed=0)
    example = next(it)
    rng = jax.random.PRNGKey(0)
    state = tt.create_train_state(hp, rng, example)
    state = mesh_lib.replicate(state, mesh)
    train_step, _ = tt.make_jitted_steps(hp, mesh)

    print(f'start: rss={rss_mb():.0f} MB')
    for i in range(n_steps):
        batch = next(it)
        sb = mesh_lib.shard_batch(batch, mesh)
        state, m = train_step(state, sb, rng)
        if (i + 1) % 25 == 0:
            loss = float(jax.device_get(m['loss']))
            gc.collect()
            print(f'step {i+1:4d}: rss={rss_mb():.0f} MB '
                  f'live_arrays={len(jax.live_arrays())} loss={loss:.3f}',
                  flush=True)


if __name__ == '__main__':
    main()
