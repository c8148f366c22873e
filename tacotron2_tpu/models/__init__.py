"""Model registry (reference tacotron/models/__init__.py, wavenet_vocoder/models/__init__.py)."""


def create_model(name: str, hparams, dtype=None):
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    if name in ('Tacotron', 'Tacotron-2'):
        from .tacotron.model import Tacotron
        if hparams.mask_decoder:
            print('WARNING: with mask_decoder True, the stop-token CE is pos-weighted; '
                  'recommended cross_entropy_pos_weight = 20')
        return Tacotron(hparams, dtype=dtype)
    if name == 'WaveNet':
        from .wavenet.model import WaveNet
        return WaveNet(hparams, dtype=dtype)
    raise ValueError(f'Unknown model: {name}')
