"""Learning-rate and teacher-forcing schedules.

Parity with reference tacotron/models/tacotron.py:439-463 (clipped exponential LR
decay), tacotron/models/helpers.py:134-168 (narrow cosine teacher-forcing decay), and
wavenet_vocoder/models/wavenet.py:615-629 (noam / exponential WaveNet LR)."""

import jax.numpy as jnp

from ..config import Hparams


def tacotron_learning_rate(hp: Hparams, step) -> jnp.ndarray:
    """Exponential decay after start_decay, clipped to [final_lr, init_lr]."""
    step = jnp.asarray(step, jnp.float32)
    if not hp.tacotron_decay_learning_rate:
        return jnp.full_like(step, hp.tacotron_initial_learning_rate)
    lr = hp.tacotron_initial_learning_rate * jnp.power(
        hp.tacotron_decay_rate, (step - hp.tacotron_start_decay) / hp.tacotron_decay_steps)
    return jnp.clip(lr, hp.tacotron_final_learning_rate, hp.tacotron_initial_learning_rate)


def teacher_forcing_ratio(hp: Hparams, step) -> jnp.ndarray:
    """Constant, or narrow cosine decay from init to final ratio."""
    step = jnp.asarray(step, jnp.float32)
    if hp.tacotron_teacher_forcing_mode == 'constant':
        return jnp.full_like(step, hp.tacotron_teacher_forcing_ratio)
    init = hp.tacotron_teacher_forcing_init_ratio
    if hp.tacotron_teacher_forcing_final_ratio is not None:
        alpha = hp.tacotron_teacher_forcing_final_ratio / init
    else:
        assert hp.tacotron_teacher_forcing_decay_alpha is not None
        alpha = hp.tacotron_teacher_forcing_decay_alpha
    t = jnp.clip((step - hp.tacotron_teacher_forcing_start_decay)
                 / hp.tacotron_teacher_forcing_decay_steps, 0.0, 1.0)
    cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    decayed = (1.0 - alpha) * cosine + alpha
    tfr = init * decayed
    return jnp.where(step < hp.tacotron_teacher_forcing_start_decay,
                     jnp.full_like(step, init), tfr)


def wavenet_learning_rate(hp: Hparams, step) -> jnp.ndarray:
    """noam (warmup) or exponential schedule (reference wavenet.py:615-629)."""
    step = jnp.asarray(step, jnp.float32)
    if hp.wavenet_lr_schedule == 'noam':
        # lr * warmup^0.5 * min(step * warmup^-1.5, step^-0.5)
        step = jnp.maximum(step, 1.0)
        w = hp.wavenet_warmup
        return hp.wavenet_learning_rate * (w ** 0.5) * jnp.minimum(
            step * (w ** -1.5), step ** -0.5)
    return hp.wavenet_learning_rate * jnp.power(
        hp.wavenet_decay_rate, step / hp.wavenet_decay_steps)
