import numpy as np
import pytest

from silent_speech_tpu.phonemes import (
    PHONEME_INVENTORY, SIL_ID, parse_textgrid, read_phonemes, print_confusion,
)

LONG_TG = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.5
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.5
        intervals: size = 2
        intervals [1]:
            xmin = 0
            xmax = 1.0
            text = "hello"
        intervals [2]:
            xmin = 1.0
            xmax = 2.5
            text = ""
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 2.5
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.5
            text = "HH"
        intervals [2]:
            xmin = 0.5
            xmax = 1.0
            text = "AH0"
        intervals [3]:
            xmin = 1.0
            xmax = 2.0
            text = "sp"
        intervals [4]:
            xmin = 2.0
            xmax = 2.5
            text = ""
'''


def test_inventory():
    assert len(PHONEME_INVENTORY) == 48
    assert PHONEME_INVENTORY[-1] == 'sil'


def test_parse_long_textgrid():
    tiers = parse_textgrid(LONG_TG, from_string=True)
    assert 'phones' in tiers and 'words' in tiers
    phones = tiers['phones']
    assert len(phones) == 4
    assert phones[0].text == 'HH'
    assert phones[1].xmin == pytest.approx(0.5)


def test_read_phonemes():
    ids = read_phonemes(LONG_TG, from_string=True)
    # length = int(2.5 * 86.133) + 1
    assert ids.shape[0] == int(2.5 * 86.133) + 1
    fps = 86.133
    assert ids[0] == PHONEME_INVENTORY.index('hh')
    # stress digit stripped: AH0 -> ah
    assert ids[int(0.75 * fps)] == PHONEME_INVENTORY.index('ah')
    # sp -> sil
    assert ids[int(1.5 * fps)] == SIL_ID
    assert ids[-1] == SIL_ID


def test_read_phonemes_max_len():
    ids = read_phonemes(LONG_TG, max_len=50, from_string=True)
    assert ids.shape[0] == 50


def test_print_confusion():
    conf = np.zeros((48, 48))
    conf[0, 1] = 5
    conf[1, 0] = 3
    conf[0, 0] = 10
    conf[1, 1] = 2
    lines = print_confusion(conf, n=3)
    assert lines[0].startswith('Common confusions')
    assert any('aa ae' in l or 'ae aa' in l for l in lines[1:])
