from m2tts_tpu.serving.batcher import DynamicBatcher  # noqa: F401
from m2tts_tpu.serving.pipeline import Synthesizer  # noqa: F401
