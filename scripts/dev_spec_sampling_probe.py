#!/usr/bin/env python
"""Feasibility probe for speculative AR vocoding (ROADMAP #1 / VERDICT r04 #9).

The AR kernel's device floor is ~2.6-3.0 us/step at B=8 (chained-call
measurement, docs/round5/RESULTS.md §1); the only lever left is algorithmic.
Speculative decoding would draft k samples with a cheap model and verify them
with ONE parallel teacher-forced pass of the full WaveNet (the verify is a
k-position batched matmul whose latency is ~one serial step, because the
serial step is latency-bound, not FLOPs-bound). The win is bounded by the
acceptance rate: with per-step acceptance a, a round accepts
E = (1 - a^(k+1)) / (1 - a) samples for ~1 serial-step-equivalent of verify
latency (+ k near-free draft steps), so speedup ≈ E at large k ≈ 1/(1-a).

For the default Gaussian head (out_channels=2) the standard rejection rule
accepts a draft x ~ q with prob min(1, p(x)/q(x)); the expected acceptance is
the density overlap  a = ∫ min(p, q).  This probe measures that overlap
against the strongest CHEAP draft family available without training a second
network: ridge regression from [last W samples, upsampled conditioning c_t]
to the target's mean, with a matched residual scale. It also reports the
scale-only-mismatch ceiling (draft mean == target mean) — an upper bound for
ANY cheap draft whose scale estimate is context-free.

Monte-Carlo estimator (unbiased, one draw per position):
  a ≈ mean_t  min(1, p_t(x_t) / q_t(x_t)),   x_t ~ q_t.

Usage:
  python scripts/dev_spec_sampling_probe.py CKPT_DIR [BASE_DIR] [N_UTT] [HPARAMS]
e.g.
  python scripts/dev_spec_sampling_probe.py /tmp/q4/wave_10k /tmp/q4 16 \
      "outputs_per_step=2,predict_linear=False"

Prints one JSON line with the measured acceptance rates and projected
speedups; interpret against the 2.6-3.0 us/step serial floor.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tacotron2_tpu.utils.runtime import setup_runtime  # noqa: E402
setup_runtime()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tacotron2_tpu.config import default_hparams  # noqa: E402
from tacotron2_tpu.models.wavenet.model import WaveNet  # noqa: E402
from tacotron2_tpu.training import wavenet_trainer as wt  # noqa: E402
from tacotron2_tpu.training.checkpointing import CheckpointManager  # noqa: E402

W = 16           # draft context: last W samples
CROP_FRAMES = 80  # fixed mel crop so every utterance shares one compiled shape


def _load_utterances(base_dir, hp, n):
    meta_path = os.path.join(base_dir, 'training_data', 'train.txt')
    rows = [l.rstrip('\n').split('|') for l in open(meta_path, encoding='utf-8')]
    hop = hp.get_hop_size()
    out = []
    for m in rows:
        if len(out) >= n:
            break
        mel = np.load(os.path.join(base_dir, 'training_data', 'mels', m[1]))
        if len(mel) < CROP_FRAMES:
            continue
        wav = np.load(os.path.join(base_dir, 'training_data', 'audio', m[0]))
        mel = mel[:CROP_FRAMES]
        wav = wav[:CROP_FRAMES * hop]
        out.append((wav.astype(np.float32), mel.astype(np.float32)))
    if len(out) < 4:
        raise SystemExit(f'only {len(out)} usable utterances in {meta_path}')
    return out


def _prepare_condition(mel, hp):
    """Training-feeder conditioning transform (clip + rescale to [0,1])."""
    lo, hi = ((-hp.max_abs_value, hp.max_abs_value) if hp.symmetric_mels
              else (0.0, hp.max_abs_value))
    if hp.clip_for_wavenet:
        mel = np.clip(mel, lo, hi)
    if hp.normalize_for_wavenet:
        mel = (mel - lo) / (hi - lo)
    return mel.astype(np.float32)


def main():
    ckpt_dir = sys.argv[1]
    base_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/q4'
    n_utt = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    hp = default_hparams()
    if len(sys.argv) > 4 and sys.argv[4]:
        hp.parse(sys.argv[4])
    hp = hp.freeze()
    assert hp.out_channels == 2, 'probe targets the Gaussian head'
    hop = hp.get_hop_size()

    utts = _load_utterances(base_dir, hp, n_utt)
    print(f'{len(utts)} utterances x {CROP_FRAMES} frames '
          f'({CROP_FRAMES * hop} samples)', file=sys.stderr)

    # restore EMA params (the generation weights) and pin on device
    dummy = dict(audio=np.zeros((1, hop), np.float32),
                 input_lengths=np.asarray([hop], np.int32),
                 mel_conditions=np.zeros((1, 1, hp.num_mels), np.float32))
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), dummy)
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(state)
    params = jax.device_put(state.ema_params)
    print(f'checkpoint step {int(state.step)}', file=sys.stderr)

    model = WaveNet(hp)

    @jax.jit
    def tf_forward(p, y, c):
        x = model.encode_input(y)
        y_hat = model.apply({'params': p}, x, c, None, train=False)
        c_up = model.apply({'params': p}, c,
                           method=WaveNet.upsample_conditioning)
        return y_hat, c_up

    feats, mu_p_all, ls_p_all, tgt_all, split = [], [], [], [], []
    for i, (wav, mel) in enumerate(utts):
        c = _prepare_condition(mel, hp)[None]
        y = wav[None]
        y_hat, c_up = tf_forward(params, jnp.asarray(y), jnp.asarray(c))
        y_hat = np.asarray(y_hat[0], np.float64)   # (T, 2); row t scores y[t+1]
        c_up = np.asarray(c_up[0], np.float64)     # (T, cin)
        T = y_hat.shape[0]
        # draft features for predicting y[t+1], valid t in [W-1, T-2]
        t_idx = np.arange(W - 1, T - 1)
        ctx = np.stack([wav[t - W + 1: t + 1] for t in t_idx])  # (N, W)
        f = np.concatenate([ctx, c_up[t_idx + 1],
                            np.ones((len(t_idx), 1))], axis=1)
        feats.append(f)
        mu_p_all.append(y_hat[t_idx, 0])
        ls_p_all.append(np.maximum(y_hat[t_idx, 1], hp.log_scale_min_gauss))
        tgt_all.append(wav[t_idx + 1].astype(np.float64))
        split.append(np.full(len(t_idx), i % 2))  # even utts train, odd eval

    F = np.concatenate(feats)
    mu_p = np.concatenate(mu_p_all)
    ls_p = np.concatenate(ls_p_all)
    tgt = np.concatenate(tgt_all)
    is_eval = np.concatenate(split) == 1

    # ridge draft: predict the TARGET MODEL's mean (that is what acceptance
    # compares against), not the ground-truth sample
    lam = 1e-4
    A = F[~is_eval]
    wvec = np.linalg.solve(A.T @ A + lam * np.eye(A.shape[1]),
                           A.T @ mu_p[~is_eval])
    mu_q = F @ wvec
    res = mu_q[~is_eval] - mu_p[~is_eval]
    sig_p = np.exp(ls_p)
    # draft scale: sqrt of (mean-prediction error power + target variance) —
    # the draft's best context-free match to the target's predictive spread
    sig_q = float(np.sqrt(np.mean(res ** 2) + np.mean(sig_p[~is_eval] ** 2)))

    rng = np.random.default_rng(0)

    def mc_acceptance(mu_q_v, sig_q_v, mask):
        x = mu_q_v[mask] + sig_q_v[mask] * rng.standard_normal(mask.sum())
        logp = -0.5 * ((x - mu_p[mask]) / sig_p[mask]) ** 2 - np.log(sig_p[mask])
        logq = -0.5 * ((x - mu_q_v[mask]) / sig_q_v[mask]) ** 2 - np.log(sig_q_v[mask])
        return float(np.mean(np.minimum(1.0, np.exp(logp - logq))))

    ones = np.ones_like(mu_p)
    a_linear = mc_acceptance(mu_q, sig_q * ones, is_eval)
    # ceiling 1: perfect cheap mean, context-free scale
    sig_c = float(np.sqrt(np.mean(sig_p[~is_eval] ** 2)))
    a_scale_only = mc_acceptance(mu_p, sig_c * ones, is_eval)
    # ceiling 2: perfect mean AND per-step scale (== target): a = 1 by rule
    def speedup(a, k):
        e = (1.0 - a ** (k + 1)) / (1.0 - a) if a < 1 else k + 1
        return e  # accepted samples per ~1 serial-step-equivalent verify

    out = dict(
        checkpoint=ckpt_dir, n_utt=len(utts), n_eval=int(is_eval.sum()),
        target_sigma_mean=round(float(sig_p[is_eval].mean()), 6),
        target_sigma_p50=round(float(np.median(sig_p[is_eval])), 6),
        draft_mu_rmse_vs_target_mu=round(
            float(np.sqrt(np.mean((mu_q[is_eval] - mu_p[is_eval]) ** 2))), 6),
        draft_sigma=round(sig_q, 6),
        acceptance_linear_draft=round(a_linear, 4),
        acceptance_scale_only_ceiling=round(a_scale_only, 4),
        projected_speedup_k4_linear=round(speedup(a_linear, 4), 3),
        projected_speedup_k8_linear=round(speedup(a_linear, 8), 3),
        projected_speedup_k8_ceiling=round(speedup(a_scale_only, 8), 3),
    )
    print(json.dumps(out))


if __name__ == '__main__':
    main()
