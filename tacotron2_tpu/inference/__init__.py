from . import streaming, tacotron_synthesizer, wavenet_synthesizer
from .streaming import StreamingSynthesizer

__all__ = ['tacotron_synthesizer', 'wavenet_synthesizer', 'streaming',
           'StreamingSynthesizer']
