"""Location-sensitive attention (reference tacotron/models/attention.py).

Hybrid content+location attention:
    energy = v_a . tanh(W_keys(mem) + W_query(query) + W_fil(conv31(cum_align)) + b_a)

Designed for use inside a `lax.scan` decoder: the memory projection (keys) is computed
ONCE outside the scan (`precompute_keys`), and each step only does the query/location
projections — the TPU-friendly split the TF version hides inside BahdanauAttention.

Includes the smoothing normalization option (attention.py:72-92) and the synthesis-time
monotonic/windowed constraint masking (attention.py:201-214).
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -2.0 ** 32 + 1.0


class LocationSensitiveAttention(nn.Module):
    attention_dim: int = 128
    filters: int = 32
    kernel: int = 31
    cumulate: bool = True
    smoothing: bool = False
    synthesis_constraint: bool = False
    constraint_type: str = 'window'
    win_size: int = 7
    dtype: Any = jnp.float32

    def setup(self):
        # NOTE: the memory (keys) projection lives in the parent model so it can be
        # computed once outside the decoder scan (see Tacotron.__call__).
        self.query_layer = nn.Dense(self.attention_dim, use_bias=False,
                                    dtype=self.dtype, name='query_layer')
        self.location_convolution = nn.Conv(self.filters, (self.kernel,),
                                            padding='SAME', use_bias=True,
                                            dtype=self.dtype,
                                            name='location_convolution')
        self.location_layer = nn.Dense(self.attention_dim, use_bias=False,
                                       dtype=self.dtype, name='location_layer')
        self.v_a = self.param('attention_variable_projection',
                              nn.initializers.xavier_uniform(),
                              (1, self.attention_dim), jnp.float32)
        self.b_a = self.param('attention_bias', nn.initializers.zeros,
                              (self.attention_dim,), jnp.float32)

    def __call__(self, query: jnp.ndarray, prev_alignments: jnp.ndarray,
                 prev_max_attention: jnp.ndarray, keys: jnp.ndarray,
                 values: jnp.ndarray, memory_mask: Optional[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One attention step.

        Args:
            query: (B, Q) decoder LSTM output.
            prev_alignments: (B, T) attention state (cumulative if cumulate).
            prev_max_attention: (B,) int32 argmax of previous alignments.
            keys: (B, T, D) precomputed memory projection.
            values: (B, T, M) encoder outputs (already masked/zeroed if desired).
            memory_mask: (B, T) float 0/1, or None.
        Returns: (context, alignments, next_state, max_attention)
        """
        B, T, _ = keys.shape
        processed_query = self.query_layer(query)[:, None, :]
        f = self.location_convolution(prev_alignments[..., None])
        processed_location = self.location_layer(f)

        energy = jnp.sum(
            self.v_a[0] * jnp.tanh(keys + processed_query + processed_location + self.b_a),
            axis=2)  # (B, T)

        if self.synthesis_constraint:
            pos = jnp.arange(T)[None, :]
            if self.constraint_type == 'monotonic':
                # look only at the forward win_size steps from prev max
                before = pos < prev_max_attention[:, None]
                after = pos >= prev_max_attention[:, None] + self.win_size
            else:  # window: backward gets the odd extra slot
                back = self.win_size // 2 + (self.win_size % 2 != 0)
                fwd = self.win_size // 2
                before = pos < prev_max_attention[:, None] - back
                # reference masks pos >= prev + win//2 (attention.py:210)
                after = pos >= prev_max_attention[:, None] + fwd
            energy = jnp.where(before | after, NEG_INF, energy)

        if memory_mask is not None:
            energy = jnp.where(memory_mask > 0, energy, NEG_INF)

        if self.smoothing:
            sig = jax.nn.sigmoid(energy)
            alignments = sig / jnp.sum(sig, axis=-1, keepdims=True)
        else:
            alignments = jax.nn.softmax(energy, axis=-1)

        max_attention = jnp.argmax(alignments, axis=-1).astype(jnp.int32)
        next_state = alignments + prev_alignments if self.cumulate else alignments
        context = jnp.einsum('bt,btm->bm', alignments, values)
        return context, alignments, next_state, max_attention
