from m2tts_tpu.ops.length_regulator import regulate_lengths  # noqa: F401
