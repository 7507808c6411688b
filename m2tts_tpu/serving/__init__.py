from m2tts_tpu.serving.pipeline import Synthesizer  # noqa: F401
