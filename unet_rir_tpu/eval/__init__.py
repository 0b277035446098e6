"""Evaluation: on-device metric suite, generation harness, report writers."""

from unet_rir_tpu.eval.metrics import (
    spectrogram_metrics,
    waveform_metrics,
    log_spectral_distance,
    log_spectral_distance_gated,
    parity_metrics,
    t60_estimate,
    FIFTY_MS_SAMPLES,
)
from unet_rir_tpu.eval.generation import (
    EvalConfig,
    EvalResult,
    REPORT_ROOMS,
    assemble_prediction,
    make_generate_fn,
    evaluate,
)
from unet_rir_tpu.eval.report import write_reports

__all__ = [
    "spectrogram_metrics",
    "waveform_metrics",
    "log_spectral_distance",
    "log_spectral_distance_gated",
    "parity_metrics",
    "t60_estimate",
    "FIFTY_MS_SAMPLES",
    "EvalConfig",
    "EvalResult",
    "REPORT_ROOMS",
    "assemble_prediction",
    "make_generate_fn",
    "evaluate",
    "write_reports",
]
