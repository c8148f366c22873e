#!/usr/bin/env python
"""Benchmark driver: end-to-end text→wav real-time factor on the accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: RTF (generation wall-time / audio duration) for the full two-stage pipeline —
Tacotron synthesis (scanned decoder, 700 mel frames ≈ 8.75 s of audio at the reference
audio config) followed by WaveNet vocoding (Pallas on-chip AR kernel), batch 8,
full-size default models, bf16 compute. Lower is better.

The reference publishes no numbers (BASELINE.md "published": {}); vs_baseline reports
the north-star target ratio 0.3/RTF (BASELINE.json: "<0.3 RTF on a single v5e chip"),
so vs_baseline > 1.0 means the target is beaten.
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.models.tacotron.model import Tacotron
    from tacotron2_tpu.models.wavenet.model import WaveNet
    from tacotron2_tpu.ops.pallas import wavenet_ar
    from tacotron2_tpu.training import wavenet_trainer as wt

    on_accel = jax.devices()[0].platform != 'cpu'
    hp = default_hparams()
    if on_accel:
        B, T_in, DEC_FRAMES = 8, 128, 704  # ~8.8 s of audio per sequence
        taco_dtype = jnp.bfloat16
    else:  # CPU smoke fallback
        hp.parse('enc_conv_channels=64,decoder_lstm_units=64,postnet_channels=64,'
                 'encoder_lstm_units=32,attention_dim=32,prenet_layers=[32,32],'
                 'cbhg_conv_channels=32,cbhg_projection=64,cbhg_highway_units=32,'
                 'cbhg_rnn_units=32,layers=4,residual_channels=8,gate_channels=16,'
                 'skip_out_channels=8')
        B, T_in, DEC_FRAMES = 2, 32, 64
        taco_dtype = jnp.float32

    rng = jax.random.PRNGKey(0)
    hop, sr = hp.get_hop_size(), hp.sample_rate

    # --- stage 1: Tacotron text → mel (synthesis mode, no linear post-net: GTA-style
    # mel path feeds the vocoder, reference synthesize.py Tacotron-2 flow) ---
    taco = Tacotron(hp, dtype=taco_dtype)
    inputs = jax.random.randint(rng, (B, T_in), 2, 60)
    input_lengths = jnp.full((B,), T_in, jnp.int32)
    init_rngs = {'params': rng, 'dropout': rng, 'zoneout': rng, 'teacher': rng}
    taco_vars = jax.jit(partial(taco.init, deterministic=True, max_iters=2,
                                predict_linear=False))(
        init_rngs, inputs, input_lengths)

    def taco_synth(variables, inputs, input_lengths):
        out = taco.apply(variables, inputs, input_lengths, max_iters=DEC_FRAMES,
                         deterministic=True, predict_linear=False,
                         rngs={'dropout': jax.random.PRNGKey(1)})
        return out['mel_outputs']

    taco_fn = jax.jit(taco_synth)
    mels = taco_fn(taco_vars, inputs, input_lengths)  # compile
    np.asarray(mels)

    # --- stage 2: WaveNet mel → wav via the Pallas AR kernel ---
    mel_cond = jnp.clip(mels, -hp.max_abs_value, hp.max_abs_value)
    mel_cond = (mel_cond + hp.max_abs_value) / (2 * hp.max_abs_value)
    wn_batch = dict(audio=np.zeros((1, hop), np.float32),
                    input_lengths=np.asarray([hop], np.int32),
                    mel_conditions=np.zeros((1, 1, hp.num_mels), np.float32))
    wn_state = wt.create_train_state(hp, jax.random.PRNGKey(2), wn_batch)

    def vocode(params, c):
        return wt.generate(params, hp, jax.random.PRNGKey(4), c,
                           use_pallas=on_accel and wavenet_ar.supports(hp))
    out = vocode(wn_state.ema_params, mel_cond)  # compile
    np.asarray(out['audio'])

    # --- timed end-to-end runs (min over runs: standard noise rejection) ---
    times = []
    for i in range(4):
        t0 = time.time()
        mels = taco_fn(taco_vars, inputs, input_lengths)
        mel_cond = (jnp.clip(mels, -hp.max_abs_value, hp.max_abs_value)
                    + hp.max_abs_value) / (2 * hp.max_abs_value)
        out = vocode(wn_state.ema_params, mel_cond)
        audio = np.asarray(out['audio'])
        times.append(time.time() - t0)
    elapsed = min(times)

    audio_seconds = audio.shape[1] / sr  # per-sequence duration
    rtf = elapsed / audio_seconds
    print(json.dumps({
        'metric': 'text_to_wav_rtf',
        'value': round(rtf, 4),
        'unit': 'rtf (batch 8, full-size models, single chip)',
        'vs_baseline': round(0.3 / rtf, 3),
    }))


if __name__ == '__main__':
    main()
