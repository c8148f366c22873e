"""WaveNet building blocks as flax modules, (B, T, C) channels-last layout.

TPU-native redesign of reference wavenet_vocoder/models/modules.py. Each conv exposes
two paths sharing one set of parameters:
  - the parallel path (training / teacher-forced): `lax.conv_general_dilated` over the
    whole utterance — XLA tiles these onto the MXU;
  - the incremental path (autoregressive synthesis): a linearized-weight matmul over
    the (kernel_size) taps gathered from a rolling ring buffer carried through
    `lax.scan` (the fast-WaveNet queue trick, reference modules.py:283-333).

Optional weight normalization (kernel = g * v / ||v||, reference modules.py:44-177)
reparameterizes every conv; the data-dependent init pass lives in the trainer.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _maybe_weight_norm(module: 'nn.Module', v: jnp.ndarray) -> jnp.ndarray:
    """Reparameterize kernel v (..., out) as g * v/||v|| when weight_normalization.
    The `wn_g` param is created in the module's setup()."""
    if not module.weight_normalization:
        return v
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True) + 1e-8)
    return module.wn_g * v / norm


class Conv1x1(nn.Module):
    """Pointwise conv == time-distributed dense (reference modules.py:336-389)."""
    in_features: int
    features: int
    use_bias: bool = True
    weight_normalization: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.kernel_v = self.param('kernel', nn.initializers.lecun_normal(),
                                   (self.in_features, self.features), jnp.float32)
        if self.use_bias:
            self.bias = self.param('bias', nn.initializers.zeros,
                                   (self.features,), jnp.float32)
        if self.weight_normalization:
            self.wn_g = self.param('wn_g', nn.initializers.ones,
                                   (self.features,), jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x.astype(self.dtype) @ self.effective_kernel()
        if self.use_bias:
            y = y + self.bias.astype(self.dtype)
        return y

    def effective_kernel(self) -> jnp.ndarray:
        """The (in, out) kernel after optional weight-norm reparameterization —
        exposed so the incremental path can merge projections across layers."""
        return _maybe_weight_norm(self, self.kernel_v).astype(self.dtype)


class CausalConv1D(nn.Module):
    """Left-padded dilated conv (reference modules.py:184-333).

    `__call__` runs the parallel path on (B, T, in); `incremental_step` consumes the
    taps (B, kernel_size, in) gathered by the caller's ring buffer.
    """
    in_features: int
    features: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = True
    weight_normalization: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.kernel_v = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features), jnp.float32)
        if self.use_bias:
            self.bias = self.param('bias', nn.initializers.zeros,
                                   (self.features,), jnp.float32)
        if self.weight_normalization:
            self.wn_g = self.param('wn_g', nn.initializers.ones,
                                   (self.features,), jnp.float32)

    def _kernel(self):
        return _maybe_weight_norm(self, self.kernel_v).astype(self.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) * self.dilation
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), self._kernel(),
            window_strides=(1,), padding=[(pad, 0)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=('NWC', 'WIO', 'NWC'))
        if self.use_bias:
            y = y + self.bias.astype(self.dtype)
        return y

    def incremental_step(self, taps: jnp.ndarray) -> jnp.ndarray:
        """taps: (B, kernel_size, in) = inputs at [t-(k-1)d, ..., t-d, t]."""
        k = self._kernel()  # (k, in, out)
        y = jnp.einsum('bki,kio->bo', taps.astype(self.dtype), k)
        if self.use_bias:
            y = y + self.bias.astype(self.dtype)
        return y


class ResidualConv1DGLU(nn.Module):
    """Dilated causal conv + GLU + conditioning 1x1s + residual/skip 1x1s
    (reference modules.py:392-521)."""
    residual_channels: int
    gate_channels: int
    kernel_size: int
    skip_out_channels: int
    cin_channels: int = -1
    gin_channels: int = -1
    dropout: float = 0.05
    dilation: int = 1
    use_bias: bool = True
    residual_legacy: bool = True
    weight_normalization: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.conv = CausalConv1D(self.residual_channels, self.gate_channels,
                                 self.kernel_size, self.dilation, self.use_bias,
                                 self.weight_normalization, self.dtype, name='causal_conv')
        if self.cin_channels > 0:
            self.conv1x1c = Conv1x1(self.cin_channels, self.gate_channels, self.use_bias,
                                    self.weight_normalization, self.dtype, name='conv1x1c')
        if self.gin_channels > 0:
            self.conv1x1g = Conv1x1(self.gin_channels, self.gate_channels, self.use_bias,
                                    self.weight_normalization, self.dtype, name='conv1x1g')
        gate_out = self.gate_channels // 2
        self.conv1x1_out = Conv1x1(gate_out, self.residual_channels, self.use_bias,
                                   self.weight_normalization, self.dtype, name='conv1x1_out')
        self.conv1x1_skip = Conv1x1(gate_out, self.skip_out_channels, self.use_bias,
                                    self.weight_normalization, self.dtype, name='conv1x1_skip')

    def _gate(self, conv_out, c_proj, g_proj):
        a, b = jnp.split(conv_out, 2, axis=-1)
        if c_proj is not None:
            ca, cb = jnp.split(c_proj, 2, axis=-1)
            a, b = a + ca, b + cb
        if g_proj is not None:
            ga, gb = jnp.split(g_proj, 2, axis=-1)
            a, b = a + ga, b + gb
        return jnp.tanh(a) * jax.nn.sigmoid(b)

    def _outputs(self, gated, residual):
        # Two separate 1x1 applies, deliberately NOT merged into one
        # concatenated-kernel matmul: the measured A/B (docs/round4/RESULTS.md
        # §2b) shows the merged form is SLOWER on the parallel path (+10% at
        # B=32) — it materializes the (B, T, out+skip) product and then slices,
        # an extra full HBM round-trip, whereas XLA fuses each 1x1's consumers
        # directly. (The incremental path still merges: at (B, 1) shapes the
        # matmul dispatch, not HBM traffic, dominates.) The two-call form is
        # also what the weight-norm data-dependent init pass captures
        # (weight_norm_init.py).
        s = self.conv1x1_skip(gated)
        x = self.conv1x1_out(gated)
        if self.residual_legacy:
            x = (x + residual) * float(np.sqrt(0.5))
        else:
            x = x + residual
        return x, s

    def __call__(self, x: jnp.ndarray, c: Optional[jnp.ndarray],
                 g: Optional[jnp.ndarray], train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Parallel path. x (B, T, R); c (B, T, cin) or None; g (B, T, gin) or None."""
        residual = x
        if train and self.dropout > 0:
            keep = 1.0 - self.dropout
            # bernoulli via u16 bits instead of u32 (halves the rng-generation and
            # mask-read HBM traffic — ~20 ms/step of the B=32 train step was
            # dropout, docs/round4/RESULTS.md §2); keep-prob quantization is
            # 1/65536 (2e-6 absolute — the b=32 mask shape draws ~45M samples,
            # so the realized rate difference is far below sampling noise)
            bits = jax.random.bits(self.make_rng('dropout'), x.shape, jnp.uint16)
            mask = bits < jnp.uint16(min(65535, round(keep * 65536.0)))
            x = jnp.where(mask, x / keep, 0.0)
        conv_out = self.conv(x)
        c_proj = self.conv1x1c(c) if c is not None else None
        g_proj = self.conv1x1g(g) if g is not None else None
        gated = self._gate(conv_out, c_proj, g_proj)
        return self._outputs(gated, residual)

    def incremental_step(self, taps: jnp.ndarray, c_proj: Optional[jnp.ndarray],
                         g_proj: Optional[jnp.ndarray]
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One sample. taps (B, k, R) from ring buffer (current input is taps[:, -1]);
        c_proj/g_proj (B, gate_channels) are PRE-projected conditioning — the caller
        merges the 1x1 conditioning matmuls of all layers into one (latency of the
        scan body is dominated by small sequential matmuls).
        Returns (x_out (B, R), skip (B, S))."""
        residual = taps[:, -1, :]
        conv_out = self.conv.incremental_step(taps)
        gated = self._gate(conv_out, c_proj, g_proj)
        # merge the out+skip projections into one matmul: they share the gated input
        w = jnp.concatenate([self.conv1x1_out.effective_kernel(),
                             self.conv1x1_skip.effective_kernel()], axis=1)
        y = gated @ w
        if self.use_bias:
            y = y + jnp.concatenate([self.conv1x1_out.bias,
                                     self.conv1x1_skip.bias]).astype(self.dtype)
        x, s = y[:, :self.residual_channels], y[:, self.residual_channels:]
        if self.residual_legacy:
            x = (x + residual) * float(np.sqrt(0.5))
        else:
            x = x + residual
        return x, s


class Embedding(nn.Module):
    """Speaker embedding (reference modules.py:10-41)."""
    num_embeddings: int
    embedding_dim: int
    std: float = 0.1

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param('embedding', nn.initializers.normal(self.std),
                           (self.num_embeddings, self.embedding_dim), jnp.float32)
        return table[ids]


# ----------------------------------------------------------------------
# Upsampling networks (reference modules.py:524-777, wavenet.py:162-205)
# ----------------------------------------------------------------------

def _nn_init_center_row(kernel_size: Tuple[int, int], strides_t: int, nn_scaler: float,
                        up_layers: int, out_tile: int) -> np.ndarray:
    """NN-equivalent init for 2D transpose/resize/subpixel kernels
    (reference modules.py:645-654, 686-695): zeros except center freq row."""
    kh, kw = kernel_size
    overlap = kw // strides_t
    init = np.zeros((kh, kw), np.float32)
    i = kh // 2
    js = [kw // 2 - 1, kw // 2] if kw % 2 == 0 else [kw // 2]
    for j in js:
        init[i, j] = 1.0 / max(overlap, 1.0) if kw % 2 == 0 else 1.0
    init = np.tile(init[:, :, None, None], [1, 1, 1, out_tile])
    return init * (nn_scaler ** (1.0 / up_layers))


def _nn_init_2d_transpose(kernel_size: Tuple[int, int], strides_t: int, nn_scaler: float,
                          up_layers: int) -> np.ndarray:
    """ConvTranspose2D NN init (reference modules.py:755-764): center freq row, ALL
    time columns set (transpose conv spreads each input across the stride window)."""
    kh, kw = kernel_size
    overlap = kw // strides_t
    init = np.zeros((kh, kw), np.float32)
    i = kh // 2
    for j in range(kw):
        init[i, j] = 1.0 / max(overlap, 1.0) if kw % 2 == 0 else 1.0
    init = init[:, :, None, None]
    return init * (nn_scaler ** (1.0 / up_layers))


class UpsampleConv(nn.Module):
    """Conv / transpose-conv with optional weight-norm reparameterization.

    The reference wraps every upsample conv in ``maybe_Normalize_weights``
    (wavenet_vocoder/models/wavenet.py:194-195); flax's nn.Conv can't be
    reparameterized in place, so this module owns its kernel directly. Param names
    ('kernel', 'bias', plus 'wn_g' only when weight-normalized) match nn.Conv, so
    checkpoints trained without weight norm are layout-identical."""
    features: int
    kernel_size: Tuple[int, ...]
    strides: Optional[Tuple[int, ...]] = None
    transpose: bool = False
    weight_normalization: bool = False
    kernel_init: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = len(self.kernel_size)
        in_feat = x.shape[-1]
        kinit = self.kernel_init or nn.initializers.lecun_normal()
        kernel = self.param('kernel', kinit,
                            tuple(self.kernel_size) + (in_feat, self.features),
                            jnp.float32)
        if self.weight_normalization:
            wn_g = self.param('wn_g', nn.initializers.ones, (self.features,),
                              jnp.float32)
            axes = tuple(range(kernel.ndim - 1))
            norm = jnp.sqrt(jnp.sum(jnp.square(kernel), axis=axes, keepdims=True) + 1e-8)
            kernel = wn_g * kernel / norm
        bias = self.param('bias', nn.initializers.zeros, (self.features,), jnp.float32)
        dn = {1: ('NWC', 'WIO', 'NWC'), 2: ('NHWC', 'HWIO', 'NHWC')}[ndim]
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        strides = tuple(self.strides) if self.strides else (1,) * ndim
        if self.transpose:
            y = jax.lax.conv_transpose(x, kernel, strides, 'SAME',
                                       dimension_numbers=dn)
        else:
            y = jax.lax.conv_general_dilated(x, kernel, (1,) * ndim, 'SAME',
                                             dimension_numbers=dn)
        return y + bias.astype(self.dtype)


class UpsampleNetwork(nn.Module):
    """mel (B, Tc, cin) → (B, Tc*hop, cin) local-conditioning upsampler.

    Supports the reference's 5 variants: NearestNeighbor (non-learnable), 1D/2D
    transpose convs, Resize (NN-resize → conv), SubPixel (conv → periodic shuffle),
    all with checkerboard-free NN initialization when NN_init and optional weight
    normalization (reference wavenet.py:194-195)."""
    cin_channels: int
    upsample_type: str
    upsample_scales: Tuple[int, ...]
    freq_axis_kernel_size: int = 3
    activation: Optional[str] = 'Relu'
    leaky_alpha: float = 0.4
    NN_init: bool = True
    NN_scaler: float = 0.3
    weight_normalization: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        hop = int(np.prod(self.upsample_scales))
        if self.upsample_type == 'NearestNeighbor':
            return jnp.repeat(c, hop, axis=1)

        L = len(self.upsample_scales)
        act = {'Relu': nn.relu,
               'LeakyRelu': lambda x: nn.leaky_relu(x, self.leaky_alpha),
               None: lambda x: x}[self.activation]

        if self.upsample_type == '1D':
            x = c  # (B, T, cin)
            for li, s in enumerate(self.upsample_scales):
                if self.NN_init:
                    eye = np.eye(self.cin_channels, dtype=np.float32)
                    init_np = np.tile(eye[None, :, :], [s, 1, 1])
                    init_np *= (self.NN_scaler ** (1.0 / L))
                    init = lambda key, shape, dtype=jnp.float32, v=init_np: jnp.asarray(v)
                else:
                    init = nn.initializers.lecun_normal()
                x = UpsampleConv(self.cin_channels, (s,), strides=(s,),
                                 transpose=True,
                                 weight_normalization=self.weight_normalization,
                                 kernel_init=init, dtype=self.dtype,
                                 name=f'convt1d_{li + 1}')(x)
                x = act(x)
            return x

        # image variants: (B, T, cin) → (B, H=cin, W=T, C=1)
        x = jnp.transpose(c, (0, 2, 1))[..., None]
        fk = self.freq_axis_kernel_size
        for li, s in enumerate(self.upsample_scales):
            if self.upsample_type == '2D':
                if self.NN_init:
                    init_np = _nn_init_2d_transpose((fk, s), s, self.NN_scaler, L)
                    init = lambda key, shape, dtype=jnp.float32, v=init_np: jnp.asarray(v)
                else:
                    init = nn.initializers.lecun_normal()
                x = UpsampleConv(1, (fk, s), strides=(1, s), transpose=True,
                                 weight_normalization=self.weight_normalization,
                                 kernel_init=init, dtype=self.dtype,
                                 name=f'convt2d_{li + 1}')(x)
            elif self.upsample_type == 'Resize':
                x = jnp.repeat(x, s, axis=2)  # NN resize on time axis
                if self.NN_init:
                    init_np = _nn_init_center_row((fk, s), s, self.NN_scaler, L, 1)
                    init = lambda key, shape, dtype=jnp.float32, v=init_np: jnp.asarray(v)
                else:
                    init = nn.initializers.lecun_normal()
                x = UpsampleConv(1, (fk, s),
                                 weight_normalization=self.weight_normalization,
                                 kernel_init=init, dtype=self.dtype,
                                 name=f'resize_conv_{li + 1}')(x)
            else:  # SubPixel
                conv_filters = s  # out_filters(1) * strides(1, s)
                if self.NN_init:
                    init_np = _nn_init_center_row((fk, 3), s, self.NN_scaler, L, conv_filters)
                    init = lambda key, shape, dtype=jnp.float32, v=init_np: jnp.asarray(v)
                else:
                    init = nn.initializers.lecun_normal()
                y = UpsampleConv(conv_filters, (fk, 3),
                                 weight_normalization=self.weight_normalization,
                                 kernel_init=init, dtype=self.dtype,
                                 name=f'subpixel_conv_{li + 1}')(x)
                # periodic shuffle on the time axis: (B, H, W, s) → (B, H, W*s, 1)
                B, H, W, C = y.shape
                x = y.reshape(B, H, W * s, 1)
            x = act(x)
        return jnp.transpose(x[..., 0], (0, 2, 1))  # (B, T*hop, cin)


def receptive_field_size(total_layers: int, num_cycles: int, kernel_size: int) -> int:
    """reference wavenet.py:54-71."""
    layers_per_cycle = total_layers // num_cycles
    dilations = [2 ** (i % layers_per_cycle) for i in range(total_layers)]
    return (kernel_size - 1) * sum(dilations) + 1
