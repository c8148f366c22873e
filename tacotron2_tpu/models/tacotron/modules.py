"""Tacotron NN building blocks as flax modules.

TPU-native redesign of reference tacotron/models/modules.py: the recurrent pieces are
expressed as scan-compatible cells (used under `lax.scan`/`nn.scan`), convolutions are
NWC `nn.Conv`s that XLA tiles onto the MXU, and train/inference asymmetries (zoneout,
always-on prenet dropout) are driven by explicit `deterministic` flags + named RNG
streams instead of TF graph-mode conditionals.
"""

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ZoneoutLSTMCell(nn.Module):
    """LSTM cell with zoneout on both c and h (reference modules.py:80-143).

    Training uses the dropout-of-delta formulation:
        c = (1 - z) * dropout(c_new - c_old, rate=z) + c_old
    Inference uses the expectation:
        c = (1 - z) * c_new + z * c_old
    """
    units: int
    zoneout_cell: float = 0.1
    zoneout_output: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry: Tuple[jnp.ndarray, jnp.ndarray], x: jnp.ndarray,
                 deterministic: bool = True):
        c_prev, h_prev = carry
        zx = nn.Dense(4 * self.units, use_bias=True, dtype=self.dtype, name='gates')(
            jnp.concatenate([x, h_prev], axis=-1))
        i, g, f, o = jnp.split(zx, 4, axis=-1)
        # forget_bias=1.0 matches tf.nn.rnn_cell.LSTMCell default
        c_new = jax.nn.sigmoid(f + 1.0) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)

        if deterministic:
            c = (1.0 - self.zoneout_cell) * c_new + self.zoneout_cell * c_prev
            h = (1.0 - self.zoneout_output) * h_new + self.zoneout_output * h_prev
        else:
            rng = self.make_rng('zoneout')
            k1, k2 = jax.random.split(rng)
            dc = _dropout(c_new - c_prev, self.zoneout_cell, k1)
            dh = _dropout(h_new - h_prev, self.zoneout_output, k2)
            c = (1.0 - self.zoneout_cell) * dc + c_prev
            h = (1.0 - self.zoneout_output) * dh + h_prev
        return (c, h), h_new

    @staticmethod
    def initial_state(batch: int, units: int, dtype=jnp.float32):
        return (jnp.zeros((batch, units), dtype), jnp.zeros((batch, units), dtype))


def _dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0)


class Prenet(nn.Module):
    """Information bottleneck before attention; dropout is ALWAYS on, even at
    inference (reference modules.py:220-252)."""
    layer_sizes: Sequence[int] = (256, 256)
    drop_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, size in enumerate(self.layer_sizes):
            x = nn.relu(nn.Dense(size, dtype=self.dtype, name=f'dense_{i + 1}')(x))
            x = _dropout(x, self.drop_rate, self.make_rng('dropout'))
        return x


class ConvBlock(nn.Module):
    """conv1d → batchnorm → activation → dropout with before/after BN placement
    (reference modules.py:379-393)."""
    kernel_size: int
    channels: int
    activation: Optional[Callable] = nn.relu
    drop_rate: float = 0.0
    bnorm: str = 'after'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = self.activation if self.activation is not None else (lambda v: v)
        y = nn.Conv(self.channels, (self.kernel_size,), padding='SAME', dtype=self.dtype,
                    name='conv')(x)
        if self.bnorm == 'after':
            y = act(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3,
                             dtype=jnp.float32, name='bn')(y)
        else:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3,
                             dtype=jnp.float32, name='bn')(y)
            y = act(y)
        if self.drop_rate > 0.0 and train:
            y = _dropout(y, self.drop_rate, self.make_rng('dropout'))
        return y


class EncoderConvolutions(nn.Module):
    """Stack of enc_conv_num_layers conv blocks (reference modules.py:145-174)."""
    num_layers: int = 3
    kernel_size: int = 5
    channels: int = 512
    drop_rate: float = 0.5
    bnorm: str = 'after'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = ConvBlock(self.kernel_size, self.channels, nn.relu, self.drop_rate,
                          self.bnorm, self.dtype, name=f'conv_{i + 1}')(x, train)
        return x


def _reverse_sequences(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row's first `lengths[b]` elements, keeping padding in place."""
    B, T = x.shape[0], x.shape[1]
    pos = jnp.arange(T)[None, :]
    rev_idx = jnp.where(pos < lengths[:, None], lengths[:, None] - 1 - pos, pos)
    return jnp.take_along_axis(x, rev_idx[..., None], axis=1)


class BiZoneoutLSTM(nn.Module):
    """Bidirectional zoneout-LSTM encoder RNN (reference modules.py:177-217).

    Sequence-length aware: the backward pass reverses only the valid region and
    padded steps do not update state (mask-carry), matching
    tf.nn.bidirectional_dynamic_rnn(sequence_length=...).
    """
    units: int = 256
    zoneout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        B, T, _ = x.shape
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)  # (B, T)
        U = self.units
        zo = self.zoneout

        def run(cell_name, seq):
            # The cell is only CALLED at init time (to materialize its params with
            # the standard layout); the scan below reads those params directly and
            # hoists the input-side half of the gate matmul out of the loop — the
            # scan body shrinks to one (B,U)@(U,4U) matmul + elementwise, which
            # also shrinks XLA autodiff's in-loop weight-grad accumulators.
            cell = ZoneoutLSTMCell(U, zo, zo, self.dtype, name=cell_name)
            if self.is_initializing():
                cell(ZoneoutLSTMCell.initial_state(B, U, x.dtype), seq[:, 0],
                     deterministic)
            p = self.scope.get_variable('params', cell_name)
            K = p['gates']['kernel'].astype(self.dtype)       # (C+U, 4U)
            b = p['gates']['bias'].astype(self.dtype)
            Cin = seq.shape[-1]
            xp = seq.astype(self.dtype) @ K[:Cin] + b         # (B, T, 4U) hoisted
            Kh = K[Cin:]
            if deterministic or zo == 0.0:
                keys = jnp.zeros((T, 2), jnp.uint32)          # unused placeholder
            else:
                keys = jax.random.split(self.make_rng('zoneout'), T)

            def step(carry, xs):
                c_prev, h_prev = carry
                xp_t, mt, key_t = xs
                z = xp_t + h_prev @ Kh
                i, g, f, o = jnp.split(z, 4, axis=-1)
                c_new = jax.nn.sigmoid(f + 1.0) * c_prev \
                    + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                if deterministic:
                    c = (1.0 - zo) * c_new + zo * c_prev
                    h = (1.0 - zo) * h_new + zo * h_prev
                else:
                    k1, k2 = jax.random.split(key_t)
                    dc = _dropout(c_new - c_prev, zo, k1)
                    dh = _dropout(h_new - h_prev, zo, k2)
                    c = (1.0 - zo) * dc + c_prev
                    h = (1.0 - zo) * dh + h_prev
                # freeze state on padded steps
                c = jnp.where(mt[:, None] > 0, c, c_prev)
                h = jnp.where(mt[:, None] > 0, h, h_prev)
                return (c, h), h_new * mt[:, None]

            init = ZoneoutLSTMCell.initial_state(B, U, x.dtype)
            _, outs = jax.lax.scan(
                step, init,
                (jnp.transpose(xp, (1, 0, 2)), mask.T, keys), unroll=2)
            return jnp.transpose(outs, (1, 0, 2))

        fw = run('fw', x)
        bw = _reverse_sequences(run('bw', _reverse_sequences(x, lengths)), lengths)
        return jnp.concatenate([fw, bw], axis=-1)


class Postnet(nn.Module):
    """5 conv blocks, tanh except the last (reference modules.py:345-376)."""
    num_layers: int = 5
    kernel_size: int = 5
    channels: int = 512
    drop_rate: float = 0.5
    bnorm: str = 'after'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_layers - 1):
            x = ConvBlock(self.kernel_size, self.channels, jnp.tanh, self.drop_rate,
                          self.bnorm, self.dtype, name=f'conv_{i + 1}')(x, train)
        x = ConvBlock(self.kernel_size, self.channels, None, self.drop_rate,
                      self.bnorm, self.dtype, name=f'conv_{self.num_layers}')(x, train)
        return x


class HighwayNet(nn.Module):
    """H*T + x*(1-T) with T bias init -1 (reference modules.py:4-16)."""
    units: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H = nn.relu(nn.Dense(self.units, dtype=self.dtype, name='H')(x))
        T = jax.nn.sigmoid(nn.Dense(
            self.units, dtype=self.dtype, name='T',
            bias_init=nn.initializers.constant(-1.0))(x))
        return H * T + x * (1.0 - T)


class CBHG(nn.Module):
    """Conv bank + maxpool + projections + highway + BiGRU (reference modules.py:19-78)."""
    K: int = 8
    conv_channels: int = 128
    pool_size: int = 2
    projections: Sequence[int] = (256, 80)
    projection_kernel_size: int = 3
    highway_layers: int = 4
    highway_units: int = 128
    rnn_units: int = 128
    bnorm: str = 'after'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        B, T, C = x.shape
        bank = [ConvBlock(k, self.conv_channels, nn.relu, 0.0, self.bnorm, self.dtype,
                          name=f'bank_{k}')(x, train) for k in range(1, self.K + 1)]
        y = jnp.concatenate(bank, axis=-1)
        # maxpool width pool_size stride 1, SAME
        y = nn.max_pool(y, (self.pool_size,), strides=(1,), padding='SAME')
        y = ConvBlock(self.projection_kernel_size, self.projections[0], nn.relu, 0.0,
                      self.bnorm, self.dtype, name='proj1')(y, train)
        y = ConvBlock(self.projection_kernel_size, self.projections[1], None, 0.0,
                      self.bnorm, self.dtype, name='proj2')(y, train)
        y = y + x  # residual
        if y.shape[-1] != self.highway_units:
            y = nn.Dense(self.highway_units, dtype=self.dtype, name='highway_in')(y)
        for i in range(self.highway_layers):
            y = HighwayNet(self.highway_units, self.dtype, name=f'highway_{i + 1}')(y)

        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(y.dtype)

        def run(cell_name, seq):
            # Params come from a real nn.GRUCell call at init (standard layout);
            # the scan reads them directly with the input-side projections
            # (ir/iz/in) hoisted out of the loop as one big matmul — the body
            # keeps only the (B,H)@(H,3H) hidden matmul + elementwise.
            H = self.rnn_units
            cell = nn.GRUCell(H, dtype=self.dtype, name=cell_name)
            if self.is_initializing():
                cell(jnp.zeros((B, H), y.dtype), seq[:, 0])
            p = self.scope.get_variable('params', cell_name)
            dt = self.dtype
            Ki = jnp.concatenate([p['ir']['kernel'], p['iz']['kernel'],
                                  p['in']['kernel']], axis=1).astype(dt)
            bi = jnp.concatenate([p['ir']['bias'], p['iz']['bias'],
                                  p['in']['bias']]).astype(dt)
            Kh = jnp.concatenate([p['hr']['kernel'], p['hz']['kernel'],
                                  p['hn']['kernel']], axis=1).astype(dt)
            bhn = p['hn']['bias'].astype(dt)
            ip = seq.astype(dt) @ Ki + bi                     # (B, T, 3H) hoisted

            def step(carry, xs):
                h = carry
                ip_t, mt = xs
                hh = h @ Kh                                   # (B, 3H)
                r = jax.nn.sigmoid(ip_t[:, :H] + hh[:, :H])
                z = jax.nn.sigmoid(ip_t[:, H:2 * H] + hh[:, H:2 * H])
                n = jnp.tanh(ip_t[:, 2 * H:] + r * (hh[:, 2 * H:] + bhn))
                new_h = (1.0 - z) * n + z * h
                new_h = jnp.where(mt[:, None] > 0, new_h, h)
                return new_h, new_h * mt[:, None]

            init = jnp.zeros((B, H), y.dtype)
            _, outs = jax.lax.scan(step, init,
                                   (jnp.transpose(ip, (1, 0, 2)), mask.T),
                                   unroll=2)
            return jnp.transpose(outs, (1, 0, 2))

        fw = run('gru_fw', y)
        bw = _reverse_sequences(run('gru_bw', _reverse_sequences(y, lengths)), lengths)
        return jnp.concatenate([fw, bw], axis=-1)
