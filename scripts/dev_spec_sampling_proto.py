#!/usr/bin/env python
"""Algorithm-level prototype of speculative AR vocoding (follows
dev_spec_sampling_probe.py's feasibility probe; see docs/round5/RESULTS.md).

Simulates speculative generation EXACTLY as a kernel would execute it, but at
the JAX level (one fixed-shape teacher-forced verify pass per round), against
the trained Gaussian-head WaveNet:

  round:  draft k samples with the linear draft (ridge on [last 16 samples,
          upsampled conditioning]), verify all k with ONE parallel
          teacher-forced pass, accept the longest prefix by the standard
          rejection rule u < min(1, p/q), then commit one extra sample at the
          first rejected position — either from the exact residual
          distribution (p-q)_+ via numerical inverse-CDF ('exact' scheme) or
          directly from p ('approx' scheme, the kernel-friendly variant whose
          per-position marginal is min(p,q) + (1-a)p).

Outputs per scheme: measured acceptance under REAL autoregressive contexts
(the probe measured teacher-forced contexts), committed samples per round,
and audio fidelity — teacher-forced NLL of the generated audio under the
model and mel-domain DTW centroid-r vs the ground-truth mel — side by side
with the standard serial kernel (ops/pallas/wavenet_ar.generate_ar) on the
same conditioning. If 'approx' matches 'exact' and the serial baseline on
both metrics, the kernel integration can use the cheap variant.

Usage:
  python scripts/dev_spec_sampling_proto.py CKPT_DIR [BASE_DIR] [K] [N_EVAL_UTT]
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
from tacotron2_tpu.ops.pallas import wavenet_ar  # noqa: E402
from tacotron2_tpu.training import wavenet_trainer as wt  # noqa: E402
from tacotron2_tpu.training.checkpointing import CheckpointManager  # noqa: E402

W = 16
T_GEN = 3968          # samples generated per utterance (fits one 4096 TF pass)
T_PAD = 4096


def _load(base_dir, hp, n, skip=0):
    rows = [l.rstrip('\n').split('|') for l in
            open(os.path.join(base_dir, 'training_data', 'train.txt'),
                 encoding='utf-8')]
    hop = hp.get_hop_size()
    need = (T_PAD + hop) // hop + 1
    out = []
    for m in rows:
        mel = np.load(os.path.join(base_dir, 'training_data', 'mels', m[1]))
        if len(mel) < need:
            continue
        if skip > 0:
            skip -= 1
            continue
        wav = np.load(os.path.join(base_dir, 'training_data', 'audio', m[0]))
        out.append((wav[:T_PAD].astype(np.float32), mel[:need].astype(np.float32)))
        if len(out) >= n:
            break
    return out


def _cond(mel, hp):
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
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_eval = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    hp = default_hparams()
    hp.parse('outputs_per_step=2,predict_linear=False,'
             'pad_mel_multiple=256,pad_text_multiple=64')
    hp = hp.freeze()
    assert hp.out_channels == 2
    hop = hp.get_hop_size()
    lsm = float(hp.log_scale_min_gauss)

    dummy = dict(audio=np.zeros((1, hop), np.float32),
                 input_lengths=np.asarray([hop], np.int32),
                 mel_conditions=np.zeros((1, 1, hp.num_mels), np.float32))
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), dummy)
    state = CheckpointManager(ckpt_dir).restore(state)
    params = jax.device_put(state.ema_params)
    model = WaveNet(hp)

    @jax.jit
    def tf_params(p, y, c_up):
        x = model.encode_input(y)
        out = model.apply({'params': p}, x, c_up, None, train=False,
                          c_is_upsampled=True)
        return out  # (1, T_PAD, 2); row t scores y[t+1]

    @jax.jit
    def upsample(p, c):
        return model.apply({'params': p}, c, method=WaveNet.upsample_conditioning)

    # ---- fit the linear draft on SELF-GENERATED contexts ----
    # Fitting on ground-truth (teacher-forced) contexts measured 0.74
    # acceptance in the probe but collapses to ~0.44 under real AR contexts
    # (draft exposure bias): the deployment distribution is the model's own
    # generated audio, so generate it with the serial kernel and fit there.
    self_fit = os.environ.get('T2_SPEC_FIT', 'self') == 'self'
    train_utts = _load(base_dir, hp, 6, skip=0)
    fit_weights = wavenet_ar.pack_params(state.ema_params, hp)
    feats, mus = [], []
    for ui, (wav, mel) in enumerate(train_utts):
        c_up = upsample(params, jnp.asarray(_cond(mel, hp)[None]))[:, :T_PAD]
        if self_fit:
            gnoise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(100 + ui),
                                           1, T_PAD)
            gen, _ = wavenet_ar.generate_ar(fit_weights, c_up, gnoise, hp,
                                            return_params=False)
            wav = np.asarray(gen[0], np.float32)
        ph = np.asarray(tf_params(params, jnp.asarray(wav[None]),
                                  c_up)[0], np.float64)
        cu = np.asarray(c_up[0], np.float64)
        t_idx = np.arange(W - 1, T_PAD - 1)
        ctx = np.stack([wav[t - W + 1: t + 1] for t in t_idx])
        feats.append(np.concatenate(
            [ctx, cu[t_idx + 1], np.ones((len(t_idx), 1))], axis=1))
        mus.append(ph[t_idx, :])
    F = np.concatenate(feats)
    ph_all = np.concatenate(mus)
    mu_tgt = ph_all[:, 0]
    wvec = np.linalg.solve(F.T @ F + 1e-4 * np.eye(F.shape[1]), F.T @ mu_tgt)
    res = F @ wvec - mu_tgt
    sig_p_train = np.exp(np.maximum(ph_all[:, 1], lsm))
    sig_q = float(np.sqrt(np.mean(res ** 2) + np.mean(sig_p_train ** 2)))
    print(f'draft fit: rmse {np.sqrt(np.mean(res**2)):.6f} sig_q {sig_q:.6f}',
          file=sys.stderr)

    eval_utts = _load(base_dir, hp, n_eval, skip=6)
    rng = np.random.default_rng(42)

    def logn(x, mu, s):
        return -0.5 * ((x - mu) / s) ** 2 - np.log(s)

    grid = np.linspace(-1.0, 1.0, 16385)

    def residual_sample(mu_p, s_p, mu_q, s_q, u):
        p = np.exp(logn(grid, mu_p, s_p))
        q = np.exp(logn(grid, mu_q, s_q))
        r = np.maximum(p - q, 0.0)
        c = np.cumsum(r)
        if c[-1] <= 0:
            return float(np.clip(rng.normal(mu_p, s_p), -1, 1))
        return float(grid[np.searchsorted(c, u * c[-1])])

    report = dict(checkpoint=ckpt_dir, k=K, w=W, n_eval_utt=len(eval_utts),
                  t_gen=T_GEN, draft_sigma=round(sig_q, 6), schemes={})

    per_scheme = {s: dict(acc=[], commit=[], rounds=0, verifies=0,
                          audios=[], nll=[]) for s in ('exact', 'approx')}
    baselines = []

    for wav, mel in eval_utts:
        c_np = _cond(mel, hp)
        c_up = upsample(params, jnp.asarray(c_np[None]))[:, :T_PAD]
        cu = np.asarray(c_up[0], np.float64)

        # --- serial kernel baseline on the same conditioning ---
        weights = wavenet_ar.pack_params(state.ema_params, hp)
        noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(9), 1, T_PAD)
        base_audio, _ = wavenet_ar.generate_ar(
            weights, np.asarray(c_up, np.float32), noise, hp,
            return_params=False)
        base_audio = np.asarray(base_audio[0], np.float64)[:T_GEN]
        baselines.append(base_audio)

        for scheme in ('exact', 'approx'):
            st = per_scheme[scheme]
            x = np.zeros(T_PAD, np.float64)
            # seed the first W samples with the serial process (one normal
            # step at a time via the same verify pass — negligible cost)
            t = 1  # x[0] = 0 (the kernel's silence init)
            while t < T_GEN:
                kk = min(K, T_GEN - t)
                # draft kk samples sequentially (linear — cheap)
                drafts, mu_qs = [], []
                ctx = x[max(0, t - W):t].copy()
                ctx = np.concatenate([np.zeros(W - len(ctx)), ctx])
                for j in range(kk):
                    f = np.concatenate([ctx, cu[t + j], [1.0]])
                    mq = float(f @ wvec)
                    xd = float(np.clip(mq + sig_q * rng.standard_normal(),
                                       -1, 1))
                    mu_qs.append(mq)
                    drafts.append(xd)
                    ctx = np.concatenate([ctx[1:], [xd]])
                # one parallel verify pass over committed prefix + drafts
                y_in = x.copy()
                y_in[t:t + kk] = drafts
                ph = np.asarray(tf_params(params, jnp.asarray(
                    y_in[None].astype(np.float32)), c_up)[0], np.float64)
                st['verifies'] += 1
                st['rounds'] += 1
                mu_p = ph[t - 1:t + kk, 0]
                s_p = np.exp(np.maximum(ph[t - 1:t + kk, 1], lsm))
                n_acc = 0
                for j in range(kk):
                    ratio = np.exp(logn(drafts[j], mu_p[j], s_p[j])
                                   - logn(drafts[j], mu_qs[j], sig_q))
                    if rng.uniform() < min(1.0, ratio):
                        n_acc += 1
                    else:
                        break
                st['acc'].append(n_acc / kk)
                x[t:t + n_acc] = drafts[:n_acc]
                if n_acc < kk:  # correction at the first rejected position
                    if scheme == 'exact':
                        corr = residual_sample(mu_p[n_acc], s_p[n_acc],
                                               mu_qs[n_acc], sig_q,
                                               rng.uniform())
                    else:
                        corr = float(np.clip(
                            mu_p[n_acc] + s_p[n_acc] * rng.standard_normal(),
                            -1, 1))
                    x[t + n_acc] = corr
                    committed = n_acc + 1
                else:
                    committed = kk
                st['commit'].append(committed)
                t += committed
            st['audios'].append(x[:T_GEN].copy())

        # teacher-forced NLL of each audio under the model (fidelity check)
        for name, aud in (('base', base_audio),
                          ('exact', per_scheme['exact']['audios'][-1]),
                          ('approx', per_scheme['approx']['audios'][-1])):
            y_in = np.zeros(T_PAD, np.float32)
            y_in[:T_GEN] = aud
            ph = np.asarray(tf_params(params, jnp.asarray(y_in[None]),
                                      c_up)[0], np.float64)
            mu_p = ph[:T_GEN - 1, 0]
            s_p = np.exp(np.maximum(ph[:T_GEN - 1, 1], lsm))
            nll = float(np.mean(-logn(aud[1:], mu_p, s_p)
                                + 0.5 * np.log(2 * np.pi)))
            if name == 'base':
                report.setdefault('baseline_nll', []).append(round(nll, 4))
            else:
                per_scheme[name]['nll'].append(nll)

    # mel-domain conditioning score vs GT for every audio
    from tacotron2_tpu.ops import audio as audio_ops
    from tacotron2_tpu.ops.mcd import centroid_corr_dtw

    def mel_r(aud, mel_gt):
        w = audio_ops.preemphasis(aud.astype(np.float32), hp.preemphasis,
                                  hp.preemphasize)
        w = w / (np.abs(w).max() + 1e-9) * hp.rescaling_max
        m = audio_ops.melspectrogram(w, hp).T
        gt_frames = T_GEN // hop
        return float(centroid_corr_dtw(m, mel_gt[:gt_frames], hp))

    report['baseline_mel_r'] = [
        round(mel_r(b, e[1]), 4) for b, e in zip(baselines, eval_utts)]
    for scheme in ('exact', 'approx'):
        st = per_scheme[scheme]
        report['schemes'][scheme] = dict(
            acceptance_mean=round(float(np.mean(st['acc'])), 4),
            committed_per_round=round(float(np.mean(st['commit'])), 3),
            rounds_per_sample=round(st['rounds'] / (len(eval_utts) * T_GEN), 4),
            serial_steps_equiv_saved=round(
                1.0 - st['rounds'] / (len(eval_utts) * T_GEN), 4),
            nll=[round(v, 4) for v in st['nll']],
            mel_r=[round(mel_r(a, e[1]), 4)
                   for a, e in zip(st['audios'], eval_utts)])
    print(json.dumps(report))


if __name__ == '__main__':
    main()
