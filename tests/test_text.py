"""Text frontend unit tests + id-level parity vs the PyTorch reference."""

import sys

import numpy as np
import pytest

from m2tts_tpu.frontend import text as T

from conftest import REFERENCE_ROOT, reference_available


def test_phoneme_inventory():
    assert len(T.PHONEMES) == 42
    assert T.PHONEMES[:3] == ["AA", "AE", "AH"]
    assert T.PHONEMES[-3:] == ["SIL", "SP", "UNK"]
    assert T.PHONEME_TO_ID["SIL"] == 39
    # ids are a bijection
    assert sorted(T.PHONEME_TO_ID.values()) == list(range(42))


def test_normalize_text():
    assert T.normalize_text("Dr. Smith & Mrs. Jones") == "doctor smith and missus jones"
    assert T.normalize_text("I have 3 cats,  7 dogs.") == "i have three cats, seven dogs."
    assert T.normalize_text("  Hello   WORLD  ") == "hello world"
    # numbers beyond 20 are left as-is
    assert T.normalize_text("route 66") == "route 66"


def test_g2p_basic():
    g2p = T.SimpleG2P()
    assert g2p.convert("hello world") == ["SIL", "HH", "EH", "L", "OW", "SP",
                                          "W", "ER", "L", "D", "SIL"]
    # out-of-lexicon word falls back to letter-to-sound
    phones = g2p.convert("zyx")
    assert phones == ["SIL", "Z", "Y", "K", "SIL"]


def test_g2p_punctuation_only_word():
    g2p = T.SimpleG2P()
    # a token that is pure punctuation maps to UNK via the fallback
    assert "UNK" in g2p.convert("hello --")


def test_text_processor_padding_and_length():
    tp = T.TextProcessor()
    out = tp.process("hello world", max_length=16)
    assert out["phoneme_ids"].shape == (16,)
    assert out["phoneme_ids"].dtype == np.int32
    # 9 non-SIL phonemes: 4 + SP + 4
    assert out["length"] == 9
    assert list(out["phoneme_ids"][-5:]) == [T.SIL_ID] * 5


def test_text_processor_truncation():
    tp = T.TextProcessor()
    out = tp.process("hello world this is a long sentence", max_length=8)
    assert out["phoneme_ids"].shape == (8,)
    assert len(out["phonemes"]) == 8


def test_batch_encoding():
    tp = T.TextProcessor()
    batch = tp.batch(["hello", "hello world"], max_length=32)
    assert batch["phoneme_ids"].shape == (2, 32)
    assert batch["lengths"].tolist() == [4, 9]


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_parity_with_reference():
    """Our frontend must produce identical phoneme ids to the reference."""
    sys.path.insert(0, str(REFERENCE_ROOT / "src"))
    try:
        from utils.text import TextProcessor as RefTextProcessor  # type: ignore
    finally:
        sys.path.pop(0)

    ref = RefTextProcessor()
    ours = T.TextProcessor()
    cases = [
        "Hello world",
        "The quick brown fox jumps over the lazy dog.",
        "Dr. Smith & Mrs. Jones have 3 cats, e.g. tabbies.",
        "M2 TTS generates high quality speech synthesis.",
        "This model runs efficiently on Apple Silicon hardware.",
        "a 17 zyxwvu!!! -- ok",
        "I.e. numbers like 7 and 21 vs. letters",
        "",
    ]
    for text in cases:
        r = ref.process_text(text, max_length=64)
        o = ours.process(text, max_length=64)
        assert o["phonemes"] == r["phonemes"], text
        assert o["phoneme_ids"].tolist() == r["phoneme_ids"], text
        assert o["length"] == r["length"], text
