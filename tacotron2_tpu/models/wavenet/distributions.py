"""WaveNet output distributions: discretized mixture of logistics, Gaussian, categorical.

Parity with reference wavenet_vocoder/models/mixture.py (discretized MoL loss with the
three-way edge-case select and log-sum-exp stability, Gumbel mixture sampling) and
gaussian.py (MLE with optional CDF trick, clipped sampling), plus the masked softmax CE
for mulaw-quantize inputs (modules.py:781-800).

Layout convention: (B, T, C) channels-last everywhere (the reference is (B, C, T));
losses reduce to a scalar mean over valid positions when a mask is given.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp


def log_sum_exp(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(x, axis=-1)
    m2 = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m2), axis=-1))


def log_prob_from_logits(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(x, axis=-1, keepdims=True)
    return x - m - jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))


def discretized_mix_logistic_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                                  num_classes: int = 65536,
                                  log_scale_min: float = -32.23619130191664,
                                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Negative log-likelihood of y under a discretized MoL.

    Args:
        y_hat: (B, T, 3*nr_mix) [logit_probs | means | log_scales].
        y: (B, T) targets in [-1, 1].
        mask: optional (B, T) 0/1 validity mask.
    Returns: scalar mean NLL over valid positions.
    """
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * nr_mix:3 * nr_mix], log_scale_min)

    yb = y[..., None]  # (B, T, 1) broadcast against mixtures
    centered = yb - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)       # y == -1 edge
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)        # y == +1 edge
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    log_probs = jnp.where(
        yb < -0.999, log_cdf_plus,
        jnp.where(yb > 0.999, log_one_minus_cdf_min,
                  jnp.where(cdf_delta > 1e-5,
                            jnp.log(jnp.maximum(cdf_delta, 1e-12)),
                            log_pdf_mid - math.log((num_classes - 1) / 2))))
    log_probs = log_probs + log_prob_from_logits(logit_probs)
    nll = -log_sum_exp(log_probs)  # (B, T)
    return _reduce(nll, mask)


def sample_from_discretized_mix_logistic(y: jnp.ndarray, rng: jax.Array,
                                         log_scale_min: float = -32.23619130191664
                                         ) -> jnp.ndarray:
    """Sample from MoL params y (..., 3*nr_mix) → (...,) in [-1, 1]."""
    nr_mix = y.shape[-1] // 3
    logit_probs = y[..., :nr_mix]
    k1, k2 = jax.random.split(rng)
    # Gumbel-max mixture indicator
    temp = jax.random.uniform(k1, logit_probs.shape, minval=1e-5, maxval=1.0 - 1e-5)
    argmax = jnp.argmax(logit_probs - jnp.log(-jnp.log(temp)), axis=-1)
    one_hot = jax.nn.one_hot(argmax, nr_mix, dtype=y.dtype)
    means = jnp.sum(y[..., nr_mix:2 * nr_mix] * one_hot, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y[..., 2 * nr_mix:3 * nr_mix] * one_hot, axis=-1), log_scale_min)
    u = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return jnp.clip(x, -1.0, 1.0)


def gaussian_mle_loss(y_hat: jnp.ndarray, y: jnp.ndarray, num_classes: int,
                      log_scale_min_gauss: float = -16.118095650958319,
                      use_cdf: bool = False,
                      mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gaussian maximum-likelihood loss; y_hat (B, T, 2) [mean | log_scale], y (B, T)."""
    mean = y_hat[..., 0]
    log_scale = jnp.maximum(y_hat[..., 1], log_scale_min_gauss)
    if use_cdf:
        scale = jnp.exp(log_scale)
        half_bin = 1.0 / (num_classes - 1)
        cdf_plus = jax.scipy.stats.norm.cdf(y + half_bin, loc=mean, scale=scale)
        cdf_min = jax.scipy.stats.norm.cdf(y - half_bin, loc=mean, scale=scale)
        log_prob = jnp.log(jnp.maximum(cdf_plus - cdf_min, 1e-12))
    else:
        log_prob = -0.5 * (math.log(2.0 * math.pi) + 2.0 * log_scale
                           + jnp.square(y - mean) * jnp.exp(-2.0 * log_scale))
    return _reduce(-log_prob, mask)


def sample_from_gaussian(y: jnp.ndarray, rng: jax.Array,
                         log_scale_min_gauss: float = -16.118095650958319) -> jnp.ndarray:
    """Sample from Gaussian params y (..., 2) → (...,) clipped to [-1, 1]."""
    mean = y[..., 0]
    log_scale = jnp.maximum(y[..., 1], log_scale_min_gauss)
    x = mean + jnp.exp(log_scale) * jax.random.normal(rng, mean.shape)
    return jnp.clip(x, -1.0, 1.0)


def masked_cross_entropy_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                              mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Softmax CE for categorical output; y_hat (B, T, Q) logits, y (B, T) int ids."""
    logp = jax.nn.log_softmax(y_hat, axis=-1)
    nll = -jnp.take_along_axis(logp, y[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return _reduce(nll, mask)


def sample_from_categorical(y: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Multinomial sample from logits (...,) Q → int ids."""
    return jax.random.categorical(rng, y, axis=-1)


def _reduce(nll: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(nll)
    m = mask.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
