from m2tts_tpu.models.tts_model import (  # noqa: F401
    M2TTS,
    TextEncoder,
    DurationPredictor,
    MelDecoder,
    Vocoder,
    build_model,
    init_params,
)
