"""tacotron2_tpu — a TPU-native (JAX/XLA/pjit/Pallas) two-stage neural TTS framework.

Feature-parity rebuild of the Tacotron-2 + WaveNet reference system (see SURVEY.md),
designed TPU-first: functional flax models, `lax.scan` autoregressive decoders, GSPMD
sharding over `jax.sharding.Mesh`, and Pallas kernels on the hot paths.
"""

__version__ = '0.1.0'

from .config import Hparams, default_hparams, hparams_debug_string, paper_hparams

__all__ = ['Hparams', 'default_hparams', 'paper_hparams', 'hparams_debug_string']
