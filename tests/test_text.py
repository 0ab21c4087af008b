import numpy as np
import pytest

from silent_speech_tpu.text import (
    TextTransform, ascii_transliterate, edit_distance, wer, cer,
)


def test_charset():
    tt = TextTransform()
    assert len(tt.chars) == 37
    assert tt.chars == "abcdefghijklmnopqrstuvwxyz0123456789 "


def test_clean_text():
    tt = TextTransform()
    assert tt.clean_text("Hello, World!") == "hello world"
    assert tt.clean_text("It’s naïve — café.") == "its naive  cafe"
    assert tt.clean_text("Æsop's fables") == "aesops fables"


def test_text_roundtrip():
    tt = TextTransform()
    ints = tt.text_to_int("The 3 cats.")
    assert tt.int_to_text(ints) == "the 3 cats"


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], ["a"]) == 1
    assert edit_distance(["a", "b"], ["a", "b"]) == 0


def test_wer_corpus():
    refs = ["the cat sat", "on the mat"]
    hyps = ["the cat sat", "on a mat"]
    # 1 substitution / 6 reference words
    assert wer(refs, hyps) == pytest.approx(1 / 6)
    assert wer("a b c", "a b c") == 0.0
    assert cer(["abc"], ["axc"]) == pytest.approx(1 / 3)


def test_wer_matches_jiwer_semantics():
    # corpus-level: total edits over total ref words, not mean of per-sentence
    refs = ["a", "b c d e f g h i j k"]
    hyps = ["x", "b c d e f g h i j k"]
    assert wer(refs, hyps) == pytest.approx(1 / 11)


def test_transliterate_passthrough_ascii():
    s = "plain ascii text 123"
    assert ascii_transliterate(s) == s
