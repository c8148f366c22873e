from . import audio, dsp_jax, mulaw, stft_common

__all__ = ['audio', 'dsp_jax', 'mulaw', 'stft_common']
