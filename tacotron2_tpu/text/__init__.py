from .frontend import (EOS_ID, PAD_ID, VOCAB_SIZE, sequence_to_text,
                       text_to_sequence)
from .symbols import symbols

__all__ = ['text_to_sequence', 'sequence_to_text', 'symbols', 'PAD_ID', 'EOS_ID', 'VOCAB_SIZE']
