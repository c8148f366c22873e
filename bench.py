#!/usr/bin/env python
"""Benchmark driver: the four north-star metrics (BASELINE.md) on the accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
"extras": {...}}.

Headline metric: batch text→wav RTF (batch-8 generation wall-time / one sequence's
audio duration) for the full two-stage pipeline — Tacotron synthesis (scanned
decoder, 704 mel frames ≈ 8.8 s of audio) followed by WaveNet vocoding (Pallas
on-chip AR kernel), full-size default models, bf16. Lower is better. Same
methodology as round 1 for cross-round comparability.

extras carries the rest of the BASELINE.md reportables:
  - rtf_single: single-sequence end-to-end RTF (the reference's implied use case)
  - tacotron_mel_frames_per_sec: synthesis decoder throughput (batch 8)
  - wavenet_samples_per_sec_chip: vocoder AR throughput, aggregate over the batch
  - mel_mae_golden: host DSP chain MAE vs pinned golden vectors (tests/golden/)

The reference publishes no numbers (BASELINE.md "published": {}); vs_baseline is
the north-star target ratio 0.3/RTF (BASELINE.json: "<0.3 RTF on a single v5e
chip"), so vs_baseline > 1.0 means the target is beaten.
"""

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def mel_mae_vs_golden() -> float:
    """Host DSP chain vs pinned golden mel (BASELINE north-star: mel MAE ≤ 1e-3).

    The golden file pins the full wav→mel chain (preemphasis → STFT → mel basis →
    dB → normalize, reference datasets/audio.py:61-77) on a deterministic input;
    any numerical drift in the reimplementation shows up here."""
    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.ops import audio

    data = np.load(os.path.join(REPO, 'tests', 'golden', 'dsp_golden.npz'))
    hp = default_hparams()
    mel = audio.melspectrogram(data['wav'], hp)
    return float(np.mean(np.abs(mel - data['mel'])))


def timed(fn, *args, n=4):
    """Min wall time over n runs; device results fetched to host (axon's
    block_until_ready returns early — a host fetch is the reliable fence)."""
    out = None
    best = float('inf')
    for _ in range(n):
        t0 = time.time()
        out = jax.tree_util.tree_map(np.asarray, fn(*args))
        best = min(best, time.time() - t0)
    return best, out


def build_pipeline(hp, B, T_in, dec_frames, taco_dtype, on_accel):
    """Compile the 2-stage pipeline at batch B; returns (taco_fn, vocode_fn, inputs)."""
    from tacotron2_tpu.models.tacotron.model import Tacotron
    from tacotron2_tpu.ops.pallas import wavenet_ar
    from tacotron2_tpu.training import wavenet_trainer as wt

    rng = jax.random.PRNGKey(0)
    taco = Tacotron(hp, dtype=taco_dtype)
    inputs = jax.random.randint(rng, (B, T_in), 2, 60)
    input_lengths = jnp.full((B,), T_in, jnp.int32)
    init_rngs = {'params': rng, 'dropout': rng, 'zoneout': rng, 'teacher': rng}
    taco_vars = jax.jit(partial(taco.init, deterministic=True, max_iters=2,
                                predict_linear=False))(init_rngs, inputs, input_lengths)
    # untrained stop tokens must not fire: bench measures the FULL dec_frames decode
    # (the early-exit while_loop would otherwise flatter an untrained model)
    taco_vars = jax.tree_util.tree_map(lambda x: x, taco_vars)
    sp = taco_vars['params']['decoder']['stop_projection']
    sp['bias'] = sp['bias'] - 100.0

    def taco_synth(variables, inputs, input_lengths):
        out = taco.apply(variables, inputs, input_lengths, max_iters=dec_frames,
                         deterministic=True, predict_linear=False,
                         rngs={'dropout': jax.random.PRNGKey(1)})
        return out['mel_outputs']

    taco_fn = jax.jit(taco_synth)

    hop = hp.get_hop_size()
    wn_batch = dict(audio=np.zeros((1, hop), np.float32),
                    input_lengths=np.asarray([hop], np.int32),
                    mel_conditions=np.zeros((1, 1, hp.num_mels), np.float32))
    wn_state = wt.create_train_state(hp, jax.random.PRNGKey(2), wn_batch)

    def vocode(c):
        return wt.generate(wn_state.ema_params, hp, jax.random.PRNGKey(4), c,
                           use_pallas=on_accel and wavenet_ar.supports(hp))['audio']

    def normalize_mels(mels):
        return (jnp.clip(mels, -hp.max_abs_value, hp.max_abs_value)
                + hp.max_abs_value) / (2 * hp.max_abs_value)

    return taco_fn, vocode, normalize_mels, (taco_vars, inputs, input_lengths)


def main():
    from tacotron2_tpu.utils.runtime import setup_runtime
    setup_runtime()
    from tacotron2_tpu.config import default_hparams

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

    sr = hp.sample_rate
    mel_mae = mel_mae_vs_golden()

    # --- batch pipeline ---
    taco_fn, vocode, norm, args = build_pipeline(hp, B, T_in, DEC_FRAMES,
                                                 taco_dtype, on_accel)
    mels = taco_fn(*args)
    np.asarray(mels)  # compile + fence
    audio_out = vocode(norm(mels))
    np.asarray(audio_out)

    taco_time, mels_host = timed(taco_fn, *args)
    wn_time, audio_host = timed(vocode, norm(jnp.asarray(mels_host)))

    # end-to-end batch wall time (stages chained, host fence at the end only)
    def e2e(*a):
        return vocode(norm(taco_fn(*a)))
    batch_time, audio_host = timed(e2e, *args)

    n_samples = audio_host.shape[1]
    audio_seconds = n_samples / sr  # per-sequence duration
    rtf_batch = batch_time / audio_seconds
    mel_frames_per_sec = B * DEC_FRAMES / taco_time
    samples_per_sec = B * n_samples / wn_time

    # --- single-sequence pipeline (the reference's implied serving case) ---
    taco1, vocode1, norm1, args1 = build_pipeline(hp, 1, T_in, DEC_FRAMES,
                                                  taco_dtype, on_accel)
    np.asarray(vocode1(norm1(taco1(*args1))))  # compile
    single_time, audio1 = timed(lambda *a: vocode1(norm1(taco1(*a))), *args1)
    rtf_single = single_time / (audio1.shape[1] / sr)

    print(json.dumps({
        'metric': 'text_to_wav_rtf',
        'value': round(rtf_batch, 4),
        'unit': 'rtf (batch-8 wall / per-seq audio; full-size models, single chip)',
        'vs_baseline': round(0.3 / rtf_batch, 3),
        'extras': {
            'rtf_single': round(rtf_single, 4),
            'tacotron_mel_frames_per_sec': round(mel_frames_per_sec, 1),
            'wavenet_samples_per_sec_chip': round(samples_per_sec, 1),
            'mel_mae_golden': mel_mae,
            'audio_seconds_per_seq': round(audio_seconds, 3),
        },
    }))


if __name__ == '__main__':
    main()
