from m2tts_tpu.evaluation.metrics import (  # noqa: F401
    TTSEvaluator,
    benchmark_audio_quality,
    benchmark_model_performance,
    compute_duration_accuracy,
    compute_log_spectral_distance,
    compute_mcd,
    compute_mel_distance,
    compute_spectral_convergence,
    estimate_mos_score,
)
from m2tts_tpu.evaluation.stoi import compute_stoi  # noqa: F401
