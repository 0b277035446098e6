"""Report writers — schema-compatible with the reference artifacts.

Reproduces the three output files of rir_generation.py:363-532 so results
are apples-to-apples comparable (BASELINE.md "Output artifact schemas"):

* ``<name>_infer_time.csv``  columns: n_samples, t_model_inference_avg,
  batch_size, t_postprocess, t_loss_calc, t_global.
* ``<name>_losses.csv``      rows Global/HemiAnechoic/Large/Medium/Shoe/
  Small x 7 loss columns, with the reference's positional/scientific
  float formatting per column.
* ``<name>_results_inference.txt``  the human-readable summary.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from unet_rir_tpu.eval.generation import REPORT_ROOMS, EvalResult

# (csv column, per_sample metric key, formatter)
_LOSS_COLUMNS = (
    ("MSE spectrogram", "mse_spectrogram", "positional"),
    ("MSE magnitude", "mse_magnitude", "positional"),
    ("1-cos(y-y_) phase", "phase_1mcos", "positional"),
    ("MSE waveform", "mse_waveform", "scientific"),
    ("MSE waveform 50ms", "mse_waveform_50ms", "scientific"),
    ("Misalignment magnitude", "misalignment_magnitude_db", "scientific"),
    ("Misalignment waveform", "misalignment_waveform_db", "scientific"),
)

_ROW_TITLES = {
    "Global": "Total losses:",
    "HemiAnechoic": "HemiAnechoicRoom losses ({n} samples):",
    "Large": "LargeMeetingRoom losses ({n} samples):",
    "Medium": "MediumMeetingRoom losses ({n} samples):",
    "Shoe": "ShoeBoxRoom losses ({n} samples):",
    "Small": "SmallMeetingRoom losses: ({n} samples)",
}


def _fmt(value: float, style: str, precision: int = 4) -> str:
    if style == "scientific":
        return np.format_float_scientific(value, precision=precision)
    return np.format_float_positional(value, precision=precision)


def write_reports(result: EvalResult, out_dir: str, name: str, algorithm: str = "ph") -> str:
    """Write the three artifacts; returns the report folder path."""
    folder = os.path.join(out_dir, f"{name}_{algorithm}")
    os.makedirs(folder, exist_ok=True)

    t = result.timing
    time_df = pd.DataFrame(
        {
            "n_samples": [result.n_samples],
            "t_model_inference_avg": [_fmt(t["t_model_inference_avg"], "positional", 5)],
            "batch_size": [result.batch_size],
            "t_postprocess": [_fmt(t["t_postprocess"], "positional", 5)],
            "t_loss_calc": [_fmt(t["t_loss_calc"], "positional", 5)],
            "t_global": [_fmt(t["t_global"], "positional", 5)],
        }
    )
    time_df.to_csv(os.path.join(folder, f"{name}_infer_time.csv"), index=False)

    rooms = result.room_means()
    loss_data: dict[str, list] = {
        "room": list(REPORT_ROOMS),
        "n samples": [rooms[r]["n_samples"] for r in REPORT_ROOMS],
    }
    for col, key, style in _LOSS_COLUMNS:
        loss_data[col] = [_fmt(rooms[r][key], style) for r in REPORT_ROOMS]
    pd.DataFrame(loss_data).to_csv(os.path.join(folder, f"{name}_losses.csv"), index=False)

    _write_txt(result, rooms, folder, name)
    if "lsd_db" in result.per_sample:
        _write_parity_csv(result, folder, name)
    return folder


# The near-anechoic room sits at the Schroeder estimator's resolution
# floor: the TRUE tail-extended wav of a 0.045-0.052 s-T60 room already
# estimates at 0.086-0.089 s (68-91% "error" on ground truth — measured,
# RESULTS.md "1.3 s window"), so no prediction can score well there and
# its T60 rows measure the estimator, not the model.
_ESTIMATOR_FLOOR_ROOMS = frozenset({"HemiAnechoic"})


def _write_parity_csv(result: EvalResult, folder: str, name: str) -> None:
    """North-star parity table (no reference counterpart — LSD/T60 are the
    BASELINE.json quality gates): per-room medians + the T60 mean, the
    statistics RESULTS.md's quality tables report. Written only when the
    eval ran with EvalConfig(parity_metrics=True).

    Beyond the per-room rows the table carries two machine-readable
    honesty artifacts (VERDICT r3 #8 — previously prose-only):
    a ``Reverberant`` aggregate row over every room NOT at the T60
    estimator's resolution floor, and a ``T60 estimator floor`` flag
    column marking the rows whose T60 error is estimator-dominated."""
    from unet_rir_tpu.eval.generation import _ROOM_TO_ROW

    rooms_arr = np.array([_ROOM_TO_ROW.get(r, r) for r in result.rooms])
    ps = result.per_sample
    data: dict[str, list] = {"room": [], "n samples": []}
    cols = (
        ("LSD median (dB)", "lsd_db", np.median),
        ("LSD gated median (dB)", "lsd_gated_db", np.median),
        ("T60 rel err median", "t60_rel_err", np.median),
        ("T60 rel err mean", "t60_rel_err", np.mean),
        ("T60 true median (s)", "t60_true_s", np.median),
        ("T60 pred median (s)", "t60_pred_s", np.median),
    )
    for col, _, _ in cols:
        data[col] = []
    data["T60 estimator floor"] = []
    floor_sel = np.isin(rooms_arr, sorted(_ESTIMATOR_FLOOR_ROOMS))
    for row in ("Global", "Reverberant") + REPORT_ROOMS[1:]:
        if row == "Global":
            sel = np.ones(len(rooms_arr), bool)
            flag = "mixed" if floor_sel.any() else "no"
        elif row == "Reverberant":
            sel = ~floor_sel
            flag = "no"
        else:
            sel = rooms_arr == row
            flag = "yes" if row in _ESTIMATOR_FLOOR_ROOMS else "no"
        data["room"].append(row)
        data["n samples"].append(int(sel.sum()))
        data["T60 estimator floor"].append(flag)
        for col, key, stat in cols:
            data[col].append(
                _fmt(float(stat(ps[key][sel])), "positional") if sel.any() else "nan")
    pd.DataFrame(data).to_csv(os.path.join(folder, f"{name}_parity.csv"), index=False)


def _write_txt(result: EvalResult, rooms: dict, folder: str, name: str) -> None:
    t = result.timing
    lines = [f"{name} results:", ""]
    lines.append(
        f"Took {_fmt(t['t_model_inference_avg'], 'positional', 5)} s on average to "
        f"infer spectrograms with batch size of {result.batch_size}"
    )
    lines.append(
        f"Took {_fmt(t['t_postprocess'], 'positional', 5)} s on average to "
        f"postprocess and generate each spectrogram and waveform"
    )
    lines.append(
        f"Took {_fmt(t['t_loss_calc'], 'positional', 5)} s on average to obtain "
        f"the losses for each waveform"
    )
    lines.append(
        f"Took {_fmt(t['t_global'], 'positional', 5)} s to generate, postprocess "
        f"and obtain loss for {result.n_samples} samples"
    )
    lines.append(f"Timing method: {result.timing_method}.")
    if "readback_n_probes" in t:
        # Audit trail for the subtracted transport constant (drift-proof
        # re-probing — VERDICT r3 #7): on-chip CSV columns are only
        # interpretable alongside the constant that was subtracted.
        lines.append(
            f"Per-readback transport constant: last "
            f"{_fmt(t['readback_probe_last_s'], 'scientific')} s "
            f"(min {_fmt(t['readback_probe_min_s'], 'scientific')}, "
            f"max {_fmt(t['readback_probe_max_s'], 'scientific')} over "
            f"{int(t['readback_n_probes'])} probes)"
        )
    lines.append("")
    for row in REPORT_ROOMS:
        r = rooms[row]
        lines.append(_ROW_TITLES[row].format(n=r["n_samples"]))
        lines.append(
            f"Total loss: {_fmt(r['mse_spectrogram'], 'positional')} (MSE whole spectrogram)"
            f"\t|\tAmplitude loss: {_fmt(r['mse_magnitude'], 'positional')} (MSE amplitude)"
            f"\t|\tPhase loss: {_fmt(r['phase_1mcos'], 'positional')} (1-cos(y_true - y_pred))"
        )
        lines.append(
            f"Waveform loss: {_fmt(r['mse_waveform'], 'scientific')} (MSE)"
            f"\t|\t 50 ms waveform loss: {_fmt(r['mse_waveform_50ms'], 'scientific')} (MSE)"
        )
        lines.append(
            f"Misalignment loss (amplitude): {_fmt(r['misalignment_magnitude_db'], 'scientific')} (dB)"
            f"\t|\t Misalignment loss (wav): {_fmt(r['misalignment_waveform_db'], 'scientific')} (dB)"
        )
        lines.append("")
    with open(os.path.join(folder, f"{name}_results_inference.txt"), "w") as f:
        f.write("\n".join(lines))


__all__ = ["write_reports"]
