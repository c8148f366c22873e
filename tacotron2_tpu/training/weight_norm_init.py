"""Data-dependent weight-norm initialization (Salimans & Kingma).

Parity with the reference's init-model forward pass on fresh runs
(wavenet_vocoder/train.py:287-298, modules.py:86-133): for each weight-normalized
conv, run the network on one real batch, measure the conv output's per-channel
mean/std, then set g = init_scale/std and bias = -mean*g so every conv starts with
zero-mean unit-variance (times init_scale) activations.

The reference initializes all convs in ONE pass (each layer re-scales on the fly);
here convs are initialized in topological order with one captured forward pass per
conv, which yields the same result since upstream layers are already initialized when
a downstream conv's statistics are measured.
"""

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..config import Hparams
from ..models.wavenet.model import WaveNet


def _conv_paths(hp: Hparams) -> List[Tuple[str, ...]]:
    # upsample convs first: they feed the conditioning consumed by every conv1x1c
    # (the reference normalizes them too, wavenet.py:194-195)
    paths: List[Tuple[str, ...]] = list(_upsample_paths(hp))
    paths.append(('first_conv',))
    for i in range(hp.layers):
        blk = f'residual_block_{i + 1}'
        paths.append((blk, 'causal_conv'))
        if hp.cin_channels > 0:
            paths.append((blk, 'conv1x1c'))
        if hp.gin_channels > 0:
            paths.append((blk, 'conv1x1g'))
        paths.append((blk, 'conv1x1_out'))
        paths.append((blk, 'conv1x1_skip'))
    paths.append(('skip_conv1',))
    paths.append(('skip_conv2',))
    return paths


def _upsample_paths(hp: Hparams) -> List[Tuple[str, ...]]:
    if hp.cin_channels <= 0 or hp.upsample_type == 'NearestNeighbor':
        return []
    base = {'1D': 'convt1d', '2D': 'convt2d', 'Resize': 'resize_conv',
            'SubPixel': 'subpixel_conv'}[hp.upsample_type]
    return [('upsample_network', f'{base}_{i + 1}')
            for i in range(len(hp.upsample_scales))]


def data_dependent_init(params, batch: Dict[str, Any], hp: Hparams,
                        dtype=jnp.float32):
    """Returns params with wn_g/bias data-dependently initialized.

    No-op unless hp.wavenet_weight_normalization."""
    if not hp.wavenet_weight_normalization:
        return params
    model = WaveNet(hp, dtype=dtype)
    x = model.encode_input(jnp.asarray(batch['audio']))
    c = jnp.asarray(batch['mel_conditions']) if 'mel_conditions' in batch else None
    g = jnp.asarray(batch['speaker_ids']) if 'speaker_ids' in batch else None

    @jax.jit
    def captured_forward(p):
        _, inter = model.apply({'params': p}, x, c, g, train=False,
                               mutable=[], capture_intermediates=True)
        return inter.get('intermediates', inter)

    params = jax.tree_util.tree_map(lambda v: v, params)  # shallow copy (dicts below)
    params = _to_mutable(params)
    for path in _conv_paths(hp):
        inter = captured_forward(_freeze_view(params))
        node = inter
        for key in path:
            node = node[key]
        y = node['__call__'][0]                      # (B, T, C) conv output
        y = y.astype(jnp.float32)
        axes = tuple(range(y.ndim - 1))
        mean = jnp.mean(y, axis=axes)
        std = jnp.std(y, axis=axes) + 1e-8
        scale = hp.wavenet_init_scale / std
        p_node = params
        for key in path:
            p_node = p_node[key]
        # current output y = g*y_unit + b; with fresh g=1,b=0: y == y_unit.
        # After upstream convs were re-initialized, y is the live output and the
        # correction composes: g' = g*scale, b' = (b - mean) * scale.
        p_node['wn_g'] = jax.device_get(p_node['wn_g'] * scale)
        p_node['bias'] = jax.device_get((p_node['bias'] - mean) * scale)
    return _freeze_view(params)


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    try:  # flax FrozenDict
        return {k: _to_mutable(v) for k, v in tree.items()}
    except AttributeError:
        return tree


def _freeze_view(tree):
    return tree  # plain dicts are valid flax param trees
