#!/usr/bin/env python
"""Time the AR kernel's base vs fused critical path at full default size.

Run from the repo root on the TPU box (chip must be otherwise idle):
    python scripts/dev_fused_ar_bench.py [B] [T_SECONDS]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
from tacotron2_tpu.utils.runtime import setup_runtime
setup_runtime()

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.ops.pallas import wavenet_ar
from tacotron2_tpu.training import wavenet_trainer as wt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    hp_base = default_hparams().replace(wavenet_fused_ar=False)
    hp = hp_base
    hp_fused = hp_base.replace(wavenet_fused_ar=True)
    T = int(secs * hp.sample_rate) // 128 * 128

    rng = np.random.default_rng(0)
    hop = hp.get_hop_size()
    batch = dict(audio=np.zeros((1, hop), np.float32),
                 input_lengths=np.asarray([hop], np.int32),
                 mel_conditions=np.zeros((1, 1, hp.num_mels), np.float32))
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    weights = wavenet_ar.pack_params(state.params, hp_fused)  # superset: serves both paths
    c_up = jnp.asarray(rng.uniform(0, 1, (B, T, hp.cin_channels)), jnp.float32)
    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), B, T)

    results = {}
    for name, h in (("base", hp_base), ("fused", hp_fused)):
        audio, _ = wavenet_ar.generate_ar(weights, c_up, noise, h,
                                          return_params=False)
        a_host = np.asarray(audio)  # compile + fence
        best = float('inf')
        for _ in range(5):
            t0 = time.time()
            audio, _ = wavenet_ar.generate_ar(weights, c_up, noise, h,
                                              return_params=False)
            np.asarray(audio)
            best = min(best, time.time() - t0)
        us_step = best * 1e6 / T
        sps = B * T / best
        results[name] = (best, a_host)
        print(f'{name:6s}: {us_step:6.2f} us/step  {sps / 1e6:.2f}M samples/s '
              f'aggregate  ({best:.3f}s for {T} steps, B={B})')

    d = np.abs(results['base'][1] - results['fused'][1])
    print(f'waveform |diff|: max {d.max():.4f}  mean {d.mean():.5f} '
          f'(AR divergence expected at bf16; parity is pinned by tests)')
    print(f'speedup: {results["base"][0] / results["fused"][0]:.2f}x')


if __name__ == '__main__':
    main()
