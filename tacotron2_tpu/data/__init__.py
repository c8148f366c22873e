from . import corpora, preprocessor

__all__ = ['corpora', 'preprocessor']
