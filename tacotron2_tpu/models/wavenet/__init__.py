from .model import WaveNet, compute_wavenet_loss

__all__ = ['WaveNet', 'compute_wavenet_loss']
