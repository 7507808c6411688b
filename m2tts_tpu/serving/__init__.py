from m2tts_tpu.serving.batcher import DynamicBatcher  # noqa: F401
from m2tts_tpu.serving.pipeline import Synthesizer  # noqa: F401
from m2tts_tpu.serving.stream_batcher import StreamBatcher  # noqa: F401
from m2tts_tpu.serving.streaming import (  # noqa: F401
    StreamingSynthesizer, StreamingVocoder)
