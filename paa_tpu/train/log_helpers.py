"""Structured console/file logging for attack runs.

Reference: src/training_utils/log_helpers.py (epoch/summary tables) and
src/training_utils/build.py:19-38 (rotating-file + console logger).
"""

from __future__ import annotations

import json
import logging
import os
from logging.handlers import RotatingFileHandler

logger = logging.getLogger("paa_tpu")


def setup_logging(save_dir: str, log_name: str = "train.log", console: bool = True) -> logging.Logger:
    os.makedirs(save_dir, exist_ok=True)
    log = logging.getLogger("paa_tpu")
    log.setLevel(logging.INFO)
    log.handlers.clear()
    fh = RotatingFileHandler(
        os.path.join(save_dir, log_name), maxBytes=5_000_000, backupCount=3
    )
    fh.setFormatter(logging.Formatter("%(asctime)s | %(levelname)s | %(message)s"))
    log.addHandler(fh)
    if console:
        ch = logging.StreamHandler()
        ch.setFormatter(logging.Formatter("%(levelname)s | %(message)s"))
        log.addHandler(ch)
    return log


def log_args(log: logging.Logger, args_dict: dict) -> None:
    log.info("========= Args =========")
    log.info(json.dumps(args_dict, indent=4, default=str))
    log.info("========================")


def log_epoch_metrics(
    epoch: int,
    num_epochs: int,
    *,
    train_ctc: float,
    eval_ctc_clean: float,
    eval_ctc_perturbed: float,
    train_wer: float,
    eval_wer_clean: float,
    eval_wer_perturbed: float,
    step_time_ms: float | None = None,
) -> None:
    """Epoch metric table (reference: log_helpers.py:16-40) + step timing."""
    lines = [
        "=" * 70,
        f"Epoch {epoch}/{num_epochs} summary:",
        f"{'Metric':<10} | {'Train':>10} | {'Eval Clean':>12} | {'Eval Perturbed':>16}",
        "-" * 70,
        f"{'CTC':<10} | {train_ctc:>10.0f} | {eval_ctc_clean:>12.0f} | {eval_ctc_perturbed:>16.0f}",
        f"{'WER':<10} | {train_wer:>10.2f} | {eval_wer_clean:>12.2f} | {eval_wer_perturbed:>16.2f}",
    ]
    if step_time_ms is not None:
        lines.append(f"{'ms/step':<10} | {step_time_ms:>10.1f} |")
    lines.append("=" * 70)
    for line in lines:
        logger.info(line)


def log_summary_metrics(
    *,
    norm_type: str,
    attack_size_string: str,
    clean_ctc_test: float,
    clean_wer_test: float,
    pert_ctc_test: float,
    pert_wer_test: float,
    best_epoch: int,
) -> None:
    """Final summary table (reference: log_helpers.py:43-70)."""
    lines = [
        "=" * 70,
        "Summary",
        "=" * 70,
        f"{'Perturbation norm type:':<30} {norm_type}",
        f"{'Perturbation size:':<30} {attack_size_string}",
        "-" * 70,
        f"{'Metric':<20} | {'Clean Test':>15} | {'Perturbed Test':>15}",
        "-" * 70,
        f"Best epoch: {best_epoch}",
        f"{'CTC':<20} | {clean_ctc_test:>15.2f} | {pert_ctc_test:>15.2f}",
        f"{'WER':<20} | {clean_wer_test:>15.3f} | {pert_wer_test:>15.3f}",
        "=" * 70,
    ]
    for line in lines:
        logger.info(line)


def log_train_progress(batch_idx: int, total: int, avg_ctc: float, avg_wer: float, avg_ms: float):
    """Batch progress line (reference: log_helpers.py:73-89)."""
    logger.info(
        "Batch %d/%d | avg CTC: %.0f | avg WER: %.3f | avg time: %.1f ms",
        batch_idx, total, avg_ctc, avg_wer, avg_ms,
    )
