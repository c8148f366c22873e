#!/usr/bin/env python
"""Measure the AR kernel's DEVICE time per step, separating the tunnel fetch.

Every historical per-step number (docs/round3 4.98 us/step etc.) was wall/T of
a single call whose output fetch rides the ~17-40 MB/s tunnel: at T=44k/B=8
that inflates the per-step figure ~60%. This probe times k=1 vs k=3 chained
calls (device work scales with k, the single final fetch doesn't) so
(t3 - t1)/2 isolates one call's device time — the same amortization bench.py
uses for its *_device extras.

Usage: python scripts/dev_ar_device_time.py [B] [T_SECONDS]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
from tacotron2_tpu.utils.runtime import setup_runtime
setup_runtime()

from tacotron2_tpu.config import default_hparams  # noqa: E402
from tacotron2_tpu.ops.pallas import wavenet_ar  # noqa: E402
from tacotron2_tpu.training import wavenet_trainer as wt  # noqa: E402


def timed_chain(call, k, reps=4):
    best = float('inf')
    for _ in range(reps):
        t0 = time.time()
        out = call()
        for _ in range(k - 1):
            out = call()
        np.asarray(out)
        best = min(best, time.time() - t0)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 8.78
    hp = default_hparams()
    T = int(secs * hp.sample_rate) // wavenet_ar.CHUNK * wavenet_ar.CHUNK

    rng = np.random.default_rng(0)
    hop = hp.get_hop_size()
    batch = dict(audio=np.zeros((1, hop), np.float32),
                 input_lengths=np.asarray([hop], np.int32),
                 mel_conditions=np.zeros((1, 1, hp.num_mels), np.float32))
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    weights = wavenet_ar.pack_params(state.params, hp)
    c_up = jnp.asarray(rng.uniform(0, 1, (B, T, hp.cin_channels)), jnp.float32)
    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), B, T)

    def call():
        audio, _ = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                          return_params=False)
        return audio

    np.asarray(call())  # compile + fence
    t1 = timed_chain(call, 1)
    t3 = timed_chain(call, 3)
    dev = (t3 - t1) / 2
    fetch_mb = B * T * 4 / 1e6
    print(f'B={B} T={T}: wall(k=1) {t1:.4f}s = {t1 * 1e6 / T:.3f} us/step '
          f'({B * T / t1 / 1e6:.2f}M samples/s)')
    print(f'          device     {dev:.4f}s = {dev * 1e6 / T:.3f} us/step '
          f'({B * T / dev / 1e6:.2f}M samples/s)')
    print(f'          overhead   {t1 - dev:.4f}s for a {fetch_mb:.1f} MB fetch '
          f'+ dispatch -> implied tunnel {fetch_mb / max(t1 - dev, 1e-9):.1f} MB/s')


if __name__ == '__main__':
    main()
