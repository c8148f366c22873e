from tacotron2_tpu.text import (EOS_ID, VOCAB_SIZE, sequence_to_text, symbols,
                                text_to_sequence)
from tacotron2_tpu.text.cleaners import english_cleaners
from tacotron2_tpu.text.numbers_norm import (normalize_numbers, number_to_words,
                                             ordinal_to_words)


def test_vocab_matches_reference():
    # reference symbols.py: pad + eos + 64 ascii chars = 66 symbols
    assert VOCAB_SIZE == 66
    assert symbols[0] == '_'
    assert symbols[1] == '~'
    assert 'A' in symbols and 'z' in symbols and ' ' in symbols


def test_roundtrip():
    seq = text_to_sequence('Hello, World!', ['english_cleaners'])
    assert seq[-1] == EOS_ID
    assert sequence_to_text(seq[:-1]) == 'Hello, World!'


def test_arpabet_braces_dropped_when_disabled():
    # arpabet symbols are not in the default vocab; they get filtered, text survives
    seq = text_to_sequence('Turn left on {HH AW1 S} Street.', ['english_cleaners'])
    # each brace segment is cleaned separately (reference behavior): spaces around the
    # dropped ARPAbet span survive
    assert sequence_to_text(seq[:-1]) == 'Turn left on  Street.'


def test_number_to_words():
    assert number_to_words(0) == 'zero'
    assert number_to_words(7) == 'seven'
    assert number_to_words(21) == 'twenty-one'
    assert number_to_words(105) == 'one hundred five'
    assert number_to_words(1234567) == 'one million, two hundred thirty-four thousand, five hundred sixty-seven'


def test_ordinals():
    assert ordinal_to_words(1) == 'first'
    assert ordinal_to_words(3) == 'third'
    assert ordinal_to_words(12) == 'twelfth'
    assert ordinal_to_words(21) == 'twenty-first'
    assert ordinal_to_words(30) == 'thirtieth'
    assert ordinal_to_words(100) == 'one hundredth'


def test_normalize_numbers():
    assert normalize_numbers('$1.50') == 'one dollar, fifty cents'
    assert normalize_numbers('$3') == 'three dollars'
    assert normalize_numbers('£5') == 'five pounds'
    # decimal part re-matches _number_re whole: "14" → "fourteen" (reference behavior)
    assert normalize_numbers('3.14') == 'three point fourteen'
    assert normalize_numbers('13th') == 'thirteenth'
    assert normalize_numbers('1,000') == 'one thousand'
    assert normalize_numbers('2000') == 'two thousand'
    assert normalize_numbers('2005') == 'two thousand five'
    assert normalize_numbers('1985') == 'nineteen eighty-five'
    assert normalize_numbers('1900') == 'nineteen hundred'
    assert normalize_numbers('1705') == 'seventeen oh five'


def test_english_cleaners():
    assert english_cleaners('Mr. Smith  paid $5.') == 'mister Smith paid five dollars.'
    assert english_cleaners('Dr.  Who') == 'doctor Who'
    # accents transliterate
    assert english_cleaners('café naïve') == 'cafe naive'


def test_cleaner_keeps_case():
    # reference english_cleaners does NOT lowercase
    assert english_cleaners('HELLO') == 'HELLO'
