"""Tacotron spectrogram-prediction network, TPU-native.

Functional flax re-design of reference tacotron/models/tacotron.py:22-462. Differences
from the reference by construction (not capability):
  - no 3-phase graph protocol: `apply` is a pure function; loss/optimizer live in
    tacotron2_tpu.training
  - no tower replication / split_infos: GSPMD shards the batch over the mesh
  - the decoder (prenet→LSTM×2→attention→projections, reference
    Architecture_wrappers.py:169-213) is a single `nn.scan` cell; teacher forcing,
    stop-token tracking and alignment history are scan carries/outputs
  - synthesis runs the same scan for `max_iters` steps with a `finished` mask instead
    of dynamic_decode early exit; output lengths are recovered from stop tokens
    (reference synthesizer.py:254-256)
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import Hparams
from ...text import VOCAB_SIZE
from .attention import LocationSensitiveAttention
from .modules import (CBHG, BiZoneoutLSTM, EncoderConvolutions, Postnet, Prenet,
                      ZoneoutLSTMCell)


def output_range(hp: Hparams) -> Tuple[float, float]:
    """T2_output_range (reference tacotron.py:60-62)."""
    if hp.symmetric_mels:
        return (-hp.max_abs_value, hp.max_abs_value)
    return (0.0, hp.max_abs_value)


def _clip_outputs(x: jnp.ndarray, hp: Hparams) -> jnp.ndarray:
    lo, hi = output_range(hp)
    return jnp.clip(x, lo - hp.lower_bound_decay, hi)


class DecoderCell(nn.Module):
    """One decoder step: prenet → [context|prenet] → LSTM×2 → attention → projections.

    Scanned over time by Tacotron. Carry layout (all batch-major):
      lstm: ((c,h),) per layer; context (B, enc_dim); align_state (B, T_in);
      max_att (B,) int32; prev_frame (B, num_mels); finished (B,) bool.
    Per-step input: (teacher_frame (B, num_mels), use_teacher () bool).
    Per-step output: (frames (B, num_mels*r), stop_logits (B, r), alignments (B, T_in)).
    """
    hp: Hparams
    deterministic: bool = True
    impute_teacher: bool = True  # True: teacher frames available (train/eval/gta)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        hp = self.hp
        keys, values, memory_mask = carry['memory']
        teacher_frame, use_teacher = xs

        prev_frame = carry['prev_frame']
        dec_input = jnp.where(use_teacher, teacher_frame, prev_frame) \
            if self.impute_teacher else prev_frame

        prenet_out = Prenet(tuple(hp.prenet_layers), hp.tacotron_dropout_rate,
                            self.dtype, name='prenet')(dec_input)

        x = jnp.concatenate([prenet_out, carry['context']], axis=-1)
        new_lstm_states = []
        for i in range(hp.decoder_layers):
            cell = ZoneoutLSTMCell(hp.decoder_lstm_units, hp.tacotron_zoneout_rate,
                                   hp.tacotron_zoneout_rate, self.dtype,
                                   name=f'lstm_{i + 1}')
            state, x = cell(carry['lstm'][i], x, self.deterministic)
            new_lstm_states.append(state)

        attention = LocationSensitiveAttention(
            hp.attention_dim, hp.attention_filters, hp.attention_kernel[0],
            hp.cumulative_weights, hp.smoothing,
            hp.synthesis_constraint and not self.impute_teacher,
            hp.synthesis_constraint_type, hp.attention_win_size, self.dtype,
            name='attention')
        context, alignments, align_state, max_att = attention(
            x, carry['align_state'], carry['max_att'], keys, values, memory_mask)

        proj_in = jnp.concatenate([x, context], axis=-1)
        frames = nn.Dense(hp.num_mels * hp.outputs_per_step, dtype=self.dtype,
                          name='frame_projection')(proj_in)
        stop_logits = nn.Dense(hp.outputs_per_step, dtype=self.dtype,
                               name='stop_projection')(proj_in)

        stop_prob = jax.nn.sigmoid(stop_logits.astype(jnp.float32))
        hit = jnp.any(stop_prob > 0.5, axis=-1) if hp.stop_at_any \
            else jnp.all(stop_prob > 0.5, axis=-1)
        finished = carry['finished'] | hit

        new_carry = dict(
            memory=carry['memory'],
            lstm=tuple(new_lstm_states),
            # attention mixes f32 (softmax) with compute dtype; keep the carry stable
            context=context.astype(self.dtype),
            align_state=align_state,
            max_att=max_att,
            prev_frame=frames[:, -hp.num_mels:].astype(jnp.float32),
            finished=finished,
        )
        return new_carry, (frames.astype(jnp.float32),
                           stop_logits.astype(jnp.float32),
                           alignments.astype(jnp.float32))


class Tacotron(nn.Module):
    """Encoder + attention decoder + postnet (+ optional CBHG linear post-net)."""
    hp: Hparams
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, input_lengths: jnp.ndarray,
                 mel_targets: Optional[jnp.ndarray] = None,
                 max_iters: Optional[int] = None,
                 deterministic: bool = True,
                 teacher_forcing_ratio: Optional[jnp.ndarray] = None,
                 predict_linear: Optional[bool] = None) -> Dict[str, jnp.ndarray]:
        """Runs the full network.

        Args:
            inputs: (B, T_in) int32 character ids.
            input_lengths: (B,) int32.
            mel_targets: (B, T_out, num_mels) for train/eval/GTA; None for synthesis.
            max_iters: decoder steps for synthesis (required when mel_targets is None).
            deterministic: disables zoneout/dropout noise (prenet dropout stays on).
            teacher_forcing_ratio: scalar in [0,1]; 1.0 for GTA; ignored at synthesis.
            predict_linear: override hp.predict_linear (e.g. False for GTA synthesis).
        """
        hp = self.hp
        B, T_in = inputs.shape
        r = hp.outputs_per_step
        if predict_linear is None:
            predict_linear = hp.predict_linear

        embedding = self.param('inputs_embedding',
                               nn.initializers.normal(0.5), (VOCAB_SIZE, hp.embedding_dim),
                               jnp.float32)
        embedded = embedding[inputs].astype(self.dtype)

        enc = EncoderConvolutions(hp.enc_conv_num_layers, hp.enc_conv_kernel_size[0],
                                  hp.enc_conv_channels, hp.tacotron_dropout_rate,
                                  hp.batch_norm_position, self.dtype,
                                  name='encoder_convolutions')(embedded, not deterministic)
        encoder_outputs = BiZoneoutLSTM(hp.encoder_lstm_units, hp.tacotron_zoneout_rate,
                                        self.dtype, name='encoder_lstm')(
            enc, input_lengths, deterministic)

        memory_mask = (jnp.arange(T_in)[None, :] < input_lengths[:, None]).astype(jnp.float32)
        if hp.mask_encoder:
            values = encoder_outputs * memory_mask[..., None].astype(encoder_outputs.dtype)
            attn_mask = memory_mask
        else:
            values = encoder_outputs
            attn_mask = None

        # keys precomputed once (the expensive memory projection lives outside the scan)
        keys = nn.Dense(hp.attention_dim, use_bias=False, dtype=self.dtype,
                        name='attention_memory_layer')(values)

        is_synthesis = mel_targets is None
        if is_synthesis:
            if max_iters is None:
                max_iters = hp.max_iters
            # chunked decode with early exit (reference dynamic_decode stops when all
            # sequences finish, tacotron.py:169/custom_decoder.py:105): scan CHUNK
            # steps per lax.while_loop iteration, stop when every stop-token fired
            chunk = max(1, min(hp.decoder_chunk_size, max_iters))
            n_chunks = -(-max_iters // chunk)
            T_steps = n_chunks * chunk
        else:
            assert mel_targets.shape[1] % r == 0, 'mel targets must be padded to a multiple of r'
            T_steps = mel_targets.shape[1] // r
            # teacher input at step t is the last frame of target group t-1 (GO at t=0)
            strided = mel_targets[:, r - 1::r, :]  # (B, T_steps, M)
            teacher_frames = jnp.concatenate(
                [jnp.zeros((B, 1, hp.num_mels), strided.dtype), strided[:, :-1, :]],
                axis=1).transpose(1, 0, 2).astype(jnp.float32)
            if teacher_forcing_ratio is None:
                teacher_forcing_ratio = jnp.float32(hp.tacotron_teacher_forcing_ratio)
            coins = jax.random.uniform(self.make_rng('teacher'), (T_steps,))
            use_teacher = coins < teacher_forcing_ratio

        init_carry = dict(
            memory=(keys, values, attn_mask),
            lstm=tuple(ZoneoutLSTMCell.initial_state(B, hp.decoder_lstm_units, self.dtype)
                       for _ in range(hp.decoder_layers)),
            context=jnp.zeros((B, values.shape[-1]), self.dtype),
            align_state=jnp.zeros((B, T_in), jnp.float32),
            max_att=jnp.zeros((B,), jnp.int32),
            prev_frame=jnp.zeros((B, hp.num_mels), jnp.float32),
            finished=jnp.zeros((B,), bool),
        )

        cell_cls = DecoderCell
        if hp.remat_decoder and not is_synthesis:
            # rematerialize the decoder step on the backward pass: trades recompute
            # for activation memory (the TPU analog of the reference's
            # tacotron_swap_with_cpu host-offload flag, tacotron.py:173)
            cell_cls = nn.remat(DecoderCell, prevent_cse=False)
        scan = nn.scan(cell_cls, variable_broadcast='params',
                       split_rngs={'params': False, 'dropout': True, 'zoneout': True},
                       in_axes=0, out_axes=0,
                       length=chunk if is_synthesis else T_steps,
                       unroll=hp.decoder_scan_unroll)
        cell = scan(hp, deterministic, not is_synthesis, self.dtype, name='decoder')

        from ...ops import fused_decoder as fd
        use_fused = (not is_synthesis and hp.fused_decoder and fd.supports(hp)
                     and not self.is_initializing())
        if use_fused:
            # custom-VJP fused decoder scan: same math, hand-written backward that
            # defers the big LSTM weight-grad matmuls out of the reverse scan
            # (ops/fused_decoder.py). Params are created by the nn.scan path at
            # init and read back here, so checkpoints are layout-identical.
            dec_params = self.scope.get_variable('params', 'decoder')
            cfg = fd.config_from_hp(hp, self.dtype, deterministic)
            keep = 1.0 - hp.tacotron_dropout_rate
            if keep < 1.0:
                k1, k2 = jax.random.split(self.make_rng('dropout'))
                m1 = jax.random.bernoulli(
                    k1, keep, (T_steps, B, hp.prenet_layers[0])
                ).astype(self.dtype) / keep
                m2 = jax.random.bernoulli(
                    k2, keep, (T_steps, B, hp.prenet_layers[1])
                ).astype(self.dtype) / keep
            else:
                m1 = jnp.ones((T_steps, B, hp.prenet_layers[0]), self.dtype)
                m2 = jnp.ones((T_steps, B, hp.prenet_layers[1]), self.dtype)
            if deterministic or hp.tacotron_zoneout_rate == 0.0:
                zo = None  # zoneout expectation form
            else:
                zkeep = 1.0 - hp.tacotron_zoneout_rate
                zks = jax.random.split(self.make_rng('zoneout'), 4)
                # bool keep-gates: half the HBM traffic of bf16 masks; the fused
                # scan converts per step (exact — gates are 0/1)
                zo = tuple(jax.random.bernoulli(
                    k, zkeep, (T_steps, B, hp.decoder_lstm_units)) for k in zks)
            frames, stop_logits, alignments = fd.decoder_scan(
                cfg, dec_params, keys, values, attn_mask,
                teacher_frames, use_teacher.astype(jnp.float32), m1, m2, zo)
            # stop tracking (reference TacoTestHelper semantics), outside the vjp
            stop_prob = jax.nn.sigmoid(stop_logits)
            hit = (jnp.any(stop_prob > 0.5, axis=-1) if hp.stop_at_any
                   else jnp.all(stop_prob > 0.5, axis=-1))     # (T, B)
            final_carry = dict(finished=jnp.any(hit, axis=0))
        elif not is_synthesis:
            final_carry, (frames, stop_logits, alignments) = cell(
                init_carry, (teacher_frames, use_teacher))
        else:
            # free-running: teacher inputs are unused placeholders, one chunk's worth
            chunk_xs = (jnp.zeros((chunk, B, hp.num_mels), jnp.float32),
                        jnp.zeros((chunk,), bool))
            # stop-logit fill is "already stopped" so length recovery
            # (synthesizer._get_output_lengths) treats unvisited steps as finished
            bufs0 = (jnp.zeros((T_steps, B, hp.num_mels * r), jnp.float32),
                     jnp.full((T_steps, B, r), 1e3, jnp.float32),
                     jnp.zeros((T_steps, B, T_in), jnp.float32))

            def body_fn(cell, state):
                carry, (fb, sb, ab), i = state
                carry, (f, s, a) = cell(carry, chunk_xs)
                off = i * chunk
                fb = jax.lax.dynamic_update_slice(fb, f, (off, 0, 0))
                sb = jax.lax.dynamic_update_slice(sb, s, (off, 0, 0))
                ab = jax.lax.dynamic_update_slice(ab, a, (off, 0, 0))
                return carry, (fb, sb, ab), i + 1

            def cond_fn(cell, state):
                carry, _, i = state
                return (i < n_chunks) & ~jnp.all(carry['finished'])

            state0 = (init_carry, bufs0, jnp.int32(0))
            if self.is_mutable_collection('params'):
                state = body_fn(cell, state0)  # init pass: create params, no loop
                final_carry, (frames, stop_logits, alignments), _ = state
            elif hp.fused_decoder and fd.supports(hp) and deterministic:
                # fused free-running scan: same packed-weight step math as the
                # training fast path (banded location matmuls, hoisted weight
                # casts, unrolled scan) — the nn.scan cell re-lowers the C_in=1
                # location conv and per-step Dense applies each step
                dec_params = self.scope.get_variable('params', 'decoder')
                cfg = fd.config_from_hp(hp, self.dtype, deterministic)
                constraint = ((hp.synthesis_constraint_type, hp.attention_win_size)
                              if hp.synthesis_constraint else None)
                frames, stop_logits, alignments, finished = fd.synthesis_scan(
                    cfg, dec_params, keys, values, attn_mask, max_iters, chunk,
                    hp.tacotron_dropout_rate, self.make_rng('dropout'),
                    constraint)
                final_carry = dict(finished=finished)
            else:
                state = nn.while_loop(cond_fn, body_fn, cell, state0,
                                      split_rngs={'dropout': True, 'zoneout': True})
                final_carry, (frames, stop_logits, alignments), _ = state

        # (T_steps, B, M*r) → (B, T_steps*r, M)
        decoder_output = frames.transpose(1, 0, 2).reshape(B, T_steps * r, hp.num_mels)
        stop_token_prediction = stop_logits.transpose(1, 0, 2).reshape(B, T_steps * r)
        alignments = alignments.transpose(1, 2, 0)  # (B, T_in, T_steps)

        if hp.clip_outputs:
            decoder_output = _clip_outputs(decoder_output, hp)

        residual = Postnet(hp.postnet_num_layers, hp.postnet_kernel_size[0],
                           hp.postnet_channels, hp.tacotron_dropout_rate,
                           hp.batch_norm_position, self.dtype, name='postnet_convolutions')(
            decoder_output.astype(self.dtype), not deterministic)
        projected_residual = nn.Dense(hp.num_mels, dtype=self.dtype,
                                      name='postnet_projection')(residual)
        mel_outputs = decoder_output + projected_residual.astype(jnp.float32)
        if hp.clip_outputs:
            mel_outputs = _clip_outputs(mel_outputs, hp)

        out = dict(decoder_output=decoder_output,
                   mel_outputs=mel_outputs,
                   stop_token_prediction=stop_token_prediction,
                   alignments=alignments,
                   stop_finished=final_carry['finished'])

        if predict_linear:
            post = CBHG(hp.cbhg_kernels, hp.cbhg_conv_channels, hp.cbhg_pool_size,
                        (hp.cbhg_projection, hp.num_mels), hp.cbhg_projection_kernel_size,
                        hp.cbhg_highwaynet_layers, hp.cbhg_highway_units,
                        hp.cbhg_rnn_units, hp.batch_norm_position, self.dtype,
                        name='cbhg_postnet')(mel_outputs.astype(self.dtype), None,
                                             not deterministic)
            linear_outputs = nn.Dense(hp.num_freq, dtype=self.dtype,
                                      name='cbhg_linear_specs_projection')(post)
            linear_outputs = linear_outputs.astype(jnp.float32)
            if hp.clip_outputs:
                linear_outputs = _clip_outputs(linear_outputs, hp)
            out['linear_outputs'] = linear_outputs

        return out
