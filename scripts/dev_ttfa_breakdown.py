#!/usr/bin/env python
"""Break down streaming time-to-first-audio into per-stage wall times.

Loads the same full-size random-init checkpoints the TTFA harness serves
(scripts/dev_make_ttfa_ckpts.py) and times each stage of
StreamingSynthesizer.stream for a warm request: Tacotron decode-to-device,
bucket slice, conditioning prep, weight packing, conditioning upsample, and
the first AR chunk. Run with cwd = repo root, PYTHONPATH untouched.

Usage: python scripts/dev_ttfa_breakdown.py [ckpt_root=/tmp/ttfa_ckpts]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')

from tacotron2_tpu.config import Hparams  # noqa: E402
from tacotron2_tpu.inference.streaming import (  # noqa: E402
    StreamingSynthesizer, _prepare_conditions_device)
from tacotron2_tpu.training import wavenet_trainer as wt  # noqa: E402
from tacotron2_tpu.utils.runtime import setup_runtime  # noqa: E402

TEXT = 'The quick brown fox jumps over the lazy dog near the riverbank at dawn.'


def main():
    setup_runtime()
    root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/ttfa_ckpts'
    hp = Hparams(max_iters=400)
    s = StreamingSynthesizer().load(f'{root}/taco_pretrained',
                                    f'{root}/wave_pretrained', hp)
    hp = s._hp

    print('warmup stream (compiles everything)...')
    t0 = time.time()
    n = sum(len(chunk) for chunk in s.stream(TEXT))
    print(f'warm stream: {time.time() - t0:.2f}s for {n} samples')

    # warm request, stage by stage (host fetch per stage to time the device)
    for rep in range(2):
        stages = {}
        t = time.time()
        mel, lengths = s._taco.synthesize_to_device([TEXT])
        n_frames = int(lengths[0])
        stages['taco_decode_fetch_stop'] = time.time() - t

        t = time.time()
        mult = max(hp.pad_mel_multiple, hp.outputs_per_step)
        bucket = min(int(mel.shape[1]), -(-n_frames // mult) * mult)
        lo = -hp.max_abs_value if hp.symmetric_mels else 0.0
        mel_b = jnp.where(jnp.arange(bucket)[:, None] < n_frames,
                          mel[0, :bucket], jnp.float32(lo))
        float(mel_b[0, 0])
        stages['bucket_slice'] = time.time() - t

        t = time.time()
        c = _prepare_conditions_device(mel_b, hp)
        float(c[0, 0, 0])
        stages['prepare_conditions'] = time.time() - t

        from tacotron2_tpu.ops.pallas import wavenet_ar
        from tacotron2_tpu.models.wavenet.model import WaveNet
        t = time.time()
        weights = wavenet_ar.pack_params(s._wn._params, hp)
        jax.block_until_ready(weights)
        float(weights['b_tap'][0, 0])
        stages['pack_params'] = time.time() - t

        model = WaveNet(hp, dtype=jnp.float32)
        t = time.time()
        c_up = jax.jit(lambda p, cc: model.apply(
            {'params': p}, cc, method=WaveNet.upsample_conditioning))(
                s._wn._params, c)
        float(c_up[0, 0, 0])
        stages['upsample_fresh_lambda'] = time.time() - t

        up_jit = jax.jit(lambda p, cc: model.apply(
            {'params': p}, cc, method=WaveNet.upsample_conditioning))
        c_up2 = up_jit(s._wn._params, c)
        float(c_up2[0, 0, 0])
        t = time.time()
        c_up3 = up_jit(s._wn._params, c)
        float(c_up3[0, 0, 0])
        stages['upsample_cached_fn'] = time.time() - t

        t = time.time()
        first = 4352  # 0.2 s at 22050, CHUNK-aligned (128*34)
        noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(0), 1, first)
        seed = jnp.zeros((1,), jnp.int32)
        out = wavenet_ar.generate_ar(weights, c_up[:, :first], noise, hp,
                                     interpret=False, return_params=False,
                                     seed=seed, state_in=None,
                                     return_state=True)
        audio = out[0]
        float(jnp.asarray(audio, jnp.float32)[0, 0])
        stages['first_ar_chunk'] = time.time() - t

        t = time.time()
        total = sum(len(ch) for ch in s.stream(TEXT))
        stages['full_stream_total'] = time.time() - t

        print(f'--- rep {rep} ---')
        for k, v in stages.items():
            print(f'{k:28s} {v * 1000:9.1f} ms')


if __name__ == '__main__':
    main()
