from m2tts_tpu.frontend.text import (  # noqa: F401
    PHONEMES,
    PHONEME_TO_ID,
    ID_TO_PHONEME,
    SimpleG2P,
    TextProcessor,
    normalize_text,
)
