from .model import Tacotron

__all__ = ['Tacotron']
