"""WaveNet vocoder, TPU-native (reference wavenet_vocoder/models/wavenet.py:86-923).

Two execution paths over one parameter set:
  - `__call__` (train/teacher-forced): the whole utterance in parallel — dilated convs
    that XLA maps to the MXU (reference step(), wavenet.py:650-722);
  - `incremental`: autoregressive sample-by-sample generation as a single `lax.scan`
    whose carry holds per-layer ring buffers (the fast-WaveNet conv queues, reference
    wavenet.py:724-895), with MoL/Gaussian/categorical sampling per step.

Supports all three input types (raw scalar / mulaw scalar / mulaw-quantize one-hot),
local conditioning with all 5 upsampling variants, global (speaker) conditioning,
legacy skip/residual scaling, and the receptive-field computation.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import Hparams
from ...ops.mulaw import is_mulaw_quantize, is_scalar_input
from . import distributions as dist
from .modules import (Conv1x1, Embedding, ResidualConv1DGLU,
                      UpsampleNetwork, receptive_field_size)


class WaveNet(nn.Module):
    hp: Hparams
    dtype: Any = jnp.float32

    @property
    def receptive_field(self) -> int:
        return receptive_field_size(self.hp.layers, self.hp.stacks, self.hp.kernel_size)

    def setup(self):
        hp = self.hp
        if hp.layers % hp.stacks != 0:
            raise ValueError('layers must be a multiple of stacks')
        layers_per_stack = hp.layers // hp.stacks
        self._in_channels = 1 if is_scalar_input(hp.input_type) else hp.quantize_channels

        self.first_conv = Conv1x1(self._in_channels, hp.residual_channels, hp.use_bias,
                                  hp.wavenet_weight_normalization, self.dtype,
                                  name='first_conv')
        layer_cls = ResidualConv1DGLU
        if hp.wavenet_remat:
            # rematerialize each residual block on the backward pass: the train
            # step is HBM-bound, not FLOPs-bound (docs/round4/RESULTS.md §2), so
            # recomputing the block can be cheaper than saving its intermediates
            layer_cls = nn.remat(ResidualConv1DGLU, static_argnums=(4,),
                                 prevent_cse=False)
        self.residual_layers = [
            layer_cls(
                hp.residual_channels, hp.gate_channels, hp.kernel_size,
                hp.skip_out_channels, hp.cin_channels, hp.gin_channels,
                hp.wavenet_dropout, 2 ** (i % layers_per_stack), hp.use_bias,
                hp.residual_legacy, hp.wavenet_weight_normalization, self.dtype,
                name=f'residual_block_{i + 1}')
            for i in range(hp.layers)]
        self.skip_conv1 = Conv1x1(hp.skip_out_channels, hp.skip_out_channels,
                                  hp.use_bias, hp.wavenet_weight_normalization,
                                  self.dtype, name='skip_conv1')
        self.skip_conv2 = Conv1x1(hp.skip_out_channels, hp.out_channels, hp.use_bias,
                                  hp.wavenet_weight_normalization, self.dtype,
                                  name='skip_conv2')

        if hp.gin_channels > 0 and hp.use_speaker_embedding:
            self.embed_speakers = Embedding(hp.n_speakers, hp.gin_channels, 0.1,
                                            name='gc_embedding')
        if hp.cin_channels > 0:
            self.upsample = UpsampleNetwork(
                hp.cin_channels, hp.upsample_type, tuple(hp.upsample_scales),
                hp.freq_axis_kernel_size, hp.upsample_activation, hp.leaky_alpha,
                hp.NN_init, hp.NN_scaler, hp.wavenet_weight_normalization,
                self.dtype, name='upsample_network')

    # ------------------------------------------------------------------
    def _dilations(self):
        lps = self.hp.layers // self.hp.stacks
        return [2 ** (i % lps) for i in range(self.hp.layers)]

    def _embed_global(self, g: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
        if g is None or self.hp.gin_channels <= 0:
            return None
        if self.hp.use_speaker_embedding:
            return self.embed_speakers(g.astype(jnp.int32))  # (B, gin)
        return g

    def upsample_conditioning(self, c: jnp.ndarray) -> jnp.ndarray:
        """mel (B, Tc, cin) → (B, Tc*hop, cin); exposed for the Pallas AR kernel."""
        return self.upsample(c)

    def encode_input(self, y: jnp.ndarray) -> jnp.ndarray:
        """Audio (B, T) → network input (B, T, in_channels)."""
        if is_scalar_input(self.hp.input_type):
            return y[..., None].astype(jnp.float32)
        return jax.nn.one_hot(y.astype(jnp.int32), self.hp.quantize_channels)

    # ------------------------------------------------------------------
    def __call__(self, x: jnp.ndarray, c: Optional[jnp.ndarray] = None,
                 g: Optional[jnp.ndarray] = None, train: bool = False,
                 c_is_upsampled: bool = False) -> jnp.ndarray:
        """Teacher-forced parallel pass.

        Args:
            x: (B, T, in_channels) network input (use encode_input).
            c: (B, Tc, cin) mel conditioning (or (B, T, cin) if c_is_upsampled).
            g: (B,) speaker ids or (B, gin) embeddings.
        Returns: (B, T, out_channels) distribution params / logits.
        """
        hp = self.hp
        B, T = x.shape[0], x.shape[1]
        if c is not None and hp.cin_channels > 0:
            if not c_is_upsampled:
                c = self.upsample(c)
            assert c.shape[1] == T, f'upsampled c length {c.shape[1]} != audio {T}'
        g_emb = self._embed_global(g)
        g_seq = jnp.broadcast_to(g_emb[:, None, :], (B, T, g_emb.shape[-1])) \
            if g_emb is not None else None

        h = self.first_conv(x)
        skips = None
        for layer in self.residual_layers:
            h, s = layer(h, c, g_seq, train)
            if skips is None:
                skips = s
            else:
                skips = skips + s
                if hp.legacy:
                    skips = skips * float(np.sqrt(0.5))
        out = nn.relu(skips)
        out = nn.relu(self.skip_conv1(out))
        return self.skip_conv2(out).astype(jnp.float32)

    # ------------------------------------------------------------------
    def incremental(self, rng: jax.Array, c: Optional[jnp.ndarray] = None,
                    g: Optional[jnp.ndarray] = None,
                    synthesis_length: Optional[int] = None,
                    initial_input: Optional[jnp.ndarray] = None,
                    targets: Optional[jnp.ndarray] = None
                    ) -> Dict[str, jnp.ndarray]:
        """Autoregressive generation via lax.scan.

        Args:
            rng: sampling key.
            c: (B, Tc, cin) mel conditioning; synthesis length = Tc * hop.
            g: (B,) speaker ids.
            synthesis_length: required when c is None.
            initial_input: optional (B,) first sample (defaults to silence).
            targets: optional (B, T) ground-truth audio for teacher-forced debug
                (reference wavenet_synth_debug, wavenet.py:877-878).
        Returns: dict with 'audio' (B, T) in [-1, 1] and 'params' (B, T, out).
        """
        hp = self.hp
        if c is not None and hp.cin_channels > 0:
            c_up = self.upsample(c).astype(self.dtype)
            B, T = c_up.shape[0], c_up.shape[1]
        else:
            c_up = None
            assert synthesis_length is not None
            T = synthesis_length
            B = (g.shape[0] if g is not None else
                 (targets.shape[0] if targets is not None else 1))
        g_emb = self._embed_global(g)

        dilations = self._dilations()
        k = hp.kernel_size
        L = hp.layers
        gate = hp.gate_channels
        buffers = tuple(
            jnp.zeros((B, (k - 1) * d, hp.residual_channels), self.dtype)
            for d in dilations)

        if initial_input is None:
            if is_mulaw_quantize(hp.input_type):
                # mulaw_quantize(0) = Q//2: categorical silence (reference wavenet.py:418-424)
                init_sample = jnp.full((B,), hp.quantize_channels // 2, jnp.int32)
            else:
                init_sample = jnp.zeros((B,), jnp.float32)
        else:
            init_sample = initial_input

        # --- hoist everything loop-invariant out of the scan body ---
        # merged local-conditioning projection: one (B,cin)@(cin, L*gate) matmul per
        # step instead of L small ones (the scan body is latency-bound)
        if c_up is not None:
            wc = jnp.stack([ly.conv1x1c.effective_kernel()
                            for ly in self.residual_layers], axis=1)  # (cin, L, gate)
            wc_flat = wc.reshape(hp.cin_channels, L * gate)
            bc_flat = (jnp.concatenate([ly.conv1x1c.bias for ly in self.residual_layers])
                       .astype(self.dtype) if hp.use_bias else None)
        # global conditioning is time-invariant: project once for the whole utterance
        if g_emb is not None:
            g_projs = [ly.conv1x1g(g_emb) for ly in self.residual_layers]  # L x (B, gate)
        else:
            g_projs = [None] * L

        # pre-sampled distribution noise: per-step threefry RNG costs more than the
        # layer stack itself on TPU
        ts = jnp.arange(T)
        mulaw_q = is_mulaw_quantize(hp.input_type)
        if mulaw_q:
            noise = jax.random.split(rng, T)  # per-step categorical keys
        elif hp.out_channels == 2:
            noise = jax.random.normal(rng, (T, B))
        else:
            nr = hp.out_channels // 3
            k1, k2 = jax.random.split(rng)
            gu = jax.random.uniform(k1, (T, B, nr), minval=1e-5, maxval=1.0 - 1e-5)
            u = jax.random.uniform(k2, (T, B), minval=1e-5, maxval=1.0 - 1e-5)
            noise = (-jnp.log(-jnp.log(gu)), jnp.log(u) - jnp.log(1.0 - u))
        xs = (ts, noise) if targets is None else (ts, noise, targets.T)

        def step(carry, inp):
            buffers, prev_sample = carry
            if targets is None:
                t, noise_t = inp
            else:
                t, noise_t, teacher_t = inp
            x_t = self.encode_input(prev_sample[:, None])[:, 0, :]  # (B, in)

            if c_up is not None:
                c_t = jax.lax.dynamic_index_in_dim(c_up, t, axis=1, keepdims=False)
                c_proj_all = c_t @ wc_flat
                if bc_flat is not None:
                    c_proj_all = c_proj_all + bc_flat
                c_proj_all = c_proj_all.reshape(B, L, gate)
            h = self.first_conv(x_t)
            new_buffers = []
            skips = None
            for li, (layer, buf, d) in enumerate(zip(self.residual_layers, buffers,
                                                     dilations)):
                # circular ring buffer: O(1) update per step instead of an O(size)
                # shift-copy (the copies dominated the scan body at full size)
                if k > 1:
                    size = (k - 1) * d
                    # tap x(t-m) lives at slot (t - m) mod size; slots not yet
                    # written still hold the zero init (the causal left padding)
                    past = []
                    for j in range(k - 1):
                        m = (k - 1 - j) * d
                        slot = jax.lax.rem(t + size - m, size)
                        past.append(jax.lax.dynamic_slice(
                            buf, (0, slot, 0), (B, 1, buf.shape[2]))[:, 0, :])
                    taps = jnp.stack(past + [h], axis=1)  # (B, k, R)
                    # overwrite slot t mod size (= the x(t-size) tap, already read)
                    new_buf = jax.lax.dynamic_update_slice(
                        buf, h[:, None, :].astype(buf.dtype),
                        (0, jax.lax.rem(t, size), 0))
                else:
                    taps = h[:, None, :]
                    new_buf = buf
                c_proj = c_proj_all[:, li, :] if c_up is not None else None
                h, s = layer.incremental_step(taps, c_proj, g_projs[li])
                new_buffers.append(new_buf)
                if skips is None:
                    skips = s
                else:
                    skips = skips + s
                    if hp.legacy:
                        skips = skips * float(np.sqrt(0.5))

            out = nn.relu(skips)
            out = nn.relu(self.skip_conv1(out))
            params_t = self.skip_conv2(out).astype(jnp.float32)  # (B, out_channels)

            if mulaw_q:
                sample = dist.sample_from_categorical(params_t, noise_t)
            elif hp.out_channels == 2:
                mean = params_t[:, 0]
                log_scale = jnp.maximum(params_t[:, 1], hp.log_scale_min_gauss)
                sample = jnp.clip(mean + jnp.exp(log_scale) * noise_t, -1.0, 1.0)
            else:
                gumbel_t, logistic_t = noise_t
                nr = hp.out_channels // 3
                arg = jnp.argmax(params_t[:, :nr] + gumbel_t, axis=-1)
                onehot = jax.nn.one_hot(arg, nr, dtype=params_t.dtype)
                mean = jnp.sum(params_t[:, nr:2 * nr] * onehot, axis=-1)
                log_scale = jnp.maximum(
                    jnp.sum(params_t[:, 2 * nr:3 * nr] * onehot, axis=-1),
                    hp.log_scale_min)
                sample = jnp.clip(mean + jnp.exp(log_scale) * logistic_t, -1.0, 1.0)
            if targets is not None:
                sample = teacher_t.astype(sample.dtype)  # debug teacher forcing
            return (tuple(new_buffers), sample), (sample, params_t)

        (_, _), (samples, params) = jax.lax.scan(
            step, (buffers, init_sample.astype(
                jnp.int32 if mulaw_q else jnp.float32)), xs)
        return dict(audio=samples.T, params=jnp.transpose(params, (1, 0, 2)))


def compute_wavenet_loss(hp: Hparams, y_hat: jnp.ndarray, y: jnp.ndarray,
                         mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """One-sample-shifted NLL (reference wavenet.py:488-495): prediction at t scores
    target t+1. y_hat (B, T, out); y (B, T) raw audio or int ids; mask (B, T)."""
    y_hat_s = y_hat[:, :-1, :]
    y_s = y[:, 1:]
    mask_s = mask[:, 1:] if mask is not None else None
    if is_mulaw_quantize(hp.input_type):
        return dist.masked_cross_entropy_loss(y_hat_s, y_s, mask_s)
    if hp.out_channels == 2:
        return dist.gaussian_mle_loss(y_hat_s, y_s, hp.quantize_channels,
                                      hp.log_scale_min_gauss, hp.cdf_loss, mask_s)
    return dist.discretized_mix_logistic_loss(y_hat_s, y_s, hp.quantize_channels,
                                              hp.log_scale_min, mask_s)
