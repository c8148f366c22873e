"""Tacotron loss functions (reference tacotron/models/modules.py:403-485 and
tacotron.py:273-369): masked/unmasked mel MSE, weighted stop-token CE, linear L1 with
<2 kHz priority, and the L2 regularization variable filter."""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...config import Hparams


def sequence_mask(lengths: jnp.ndarray, max_len: int, r: int) -> jnp.ndarray:
    """(B,) → (B, max_len) mask; max_len is already padded to a multiple of r."""
    return (jnp.arange(max_len)[None, :] < lengths[:, None]).astype(jnp.float32)


def masked_mse(targets, outputs, lengths, hp: Hparams) -> jnp.ndarray:
    mask = sequence_mask(lengths, targets.shape[1], hp.outputs_per_step)[..., None]
    se = jnp.square(targets - outputs) * mask
    return jnp.sum(se) / (jnp.sum(mask) * targets.shape[-1])


def masked_sigmoid_ce(targets, logits, lengths, hp: Hparams) -> jnp.ndarray:
    mask = sequence_mask(lengths, targets.shape[1], hp.outputs_per_step)
    losses = _weighted_ce(targets, logits, hp.cross_entropy_pos_weight) * mask
    return jnp.sum(losses) / jnp.maximum(jnp.count_nonzero(losses).astype(jnp.float32), 1.0)


def masked_linear_loss(targets, outputs, lengths, hp: Hparams) -> jnp.ndarray:
    mask = sequence_mask(lengths, targets.shape[1], hp.outputs_per_step)[..., None]
    mask_full = mask * jnp.ones_like(targets)
    l1 = jnp.abs(targets - outputs) * mask_full
    n_priority = int(2000 / (hp.sample_rate * 0.5) * hp.num_freq)
    denom = jnp.sum(mask_full)
    return 0.5 * jnp.sum(l1) / denom + 0.5 * jnp.sum(l1[:, :, :n_priority]) / denom


def _weighted_ce(targets, logits, pos_weight: float) -> jnp.ndarray:
    """tf.nn.weighted_cross_entropy_with_logits semantics."""
    log_weight = 1.0 + (pos_weight - 1.0) * targets
    return ((1.0 - targets) * logits +
            log_weight * (jnp.log1p(jnp.exp(-jnp.abs(logits))) +
                          nn_relu(-logits)))


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def l2_regularization(params, hp: Hparams) -> jnp.ndarray:
    """Sum of l2_loss over weights, excluding biases, RNN/LSTM weights, embedding and
    projection layers (reference tacotron.py:336-345)."""
    if hp.tacotron_scale_regularization:
        scaler = 1.0 / (2 * hp.max_abs_value) if hp.symmetric_mels else 1.0 / hp.max_abs_value
        reg_weight = hp.tacotron_reg_weight * scaler
    else:
        reg_weight = hp.tacotron_reg_weight

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = jnp.float32(0.0)
    for path, leaf in flat:
        name = '/'.join(str(getattr(p, 'key', p)) for p in path).lower()
        if ('bias' in name or '_projection' in name or 'inputs_embedding' in name
                or 'lstm' in name or 'gru' in name):
            continue
        total = total + 0.5 * jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return total * reg_weight


def compute_losses(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                   params, hp: Hparams) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total Tacotron loss: before + after + stop + reg (+ linear).

    batch keys: mel_targets (B,T,M), stop_token_targets (B,T), targets_lengths (B,),
    and linear_targets (B,T,F) when hp.predict_linear.
    """
    mel_t = batch['mel_targets']
    if hp.mask_decoder:
        before = masked_mse(mel_t, outputs['decoder_output'], batch['targets_lengths'], hp)
        after = masked_mse(mel_t, outputs['mel_outputs'], batch['targets_lengths'], hp)
        stop = masked_sigmoid_ce(batch['stop_token_targets'],
                                 outputs['stop_token_prediction'],
                                 batch['targets_lengths'], hp)
        linear = (masked_linear_loss(batch['linear_targets'], outputs['linear_outputs'],
                                     batch['targets_lengths'], hp)
                  if hp.predict_linear and 'linear_outputs' in outputs else jnp.float32(0.0))
    else:
        before = jnp.mean(jnp.square(mel_t - outputs['decoder_output']))
        after = jnp.mean(jnp.square(mel_t - outputs['mel_outputs']))
        stop = jnp.mean(_weighted_ce(batch['stop_token_targets'],
                                     outputs['stop_token_prediction'], 1.0))
        if hp.predict_linear and 'linear_outputs' in outputs:
            l1 = jnp.abs(batch['linear_targets'] - outputs['linear_outputs'])
            n_priority = int(2000 / (hp.sample_rate * 0.5) * hp.num_freq)
            linear = 0.5 * jnp.mean(l1) + 0.5 * jnp.mean(l1[:, :, :n_priority])
        else:
            linear = jnp.float32(0.0)

    reg = l2_regularization(params, hp)
    total = before + after + stop + reg + linear
    return total, dict(before_loss=before, after_loss=after, stop_token_loss=stop,
                       regularization_loss=reg, linear_loss=linear, loss=total)
