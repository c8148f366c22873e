from . import tacotron_synthesizer, wavenet_synthesizer

__all__ = ['tacotron_synthesizer', 'wavenet_synthesizer']
