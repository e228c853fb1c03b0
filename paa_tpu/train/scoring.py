"""Score tracking: better-than comparisons and best aggregation.

Reference: src/training_utils/scoring_helpers.py (whose missing
``dataclass`` import is fixed here, SURVEY.md §5.9).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Scores:
    ctc: float
    wer: float


def is_better(curr: float, best: float, mode: str) -> bool:
    """Targeted: lower WER is better (hit the target); untargeted: higher
    CTC loss is better (degrade ASR). Reference: scoring_helpers.py:6-16."""
    if mode == "targeted":
        return curr < best
    if mode == "untargeted":
        return curr > best
    raise ValueError(f"Unknown attack_mode: {mode!r}")


def best_agg(values: list, mode: str) -> float:
    """Min for targeted, max for untargeted (scoring_helpers.py:18-22)."""
    if not values:
        return float("inf") if mode == "targeted" else float("-inf")
    return (min if mode == "targeted" else max)(values)


def initial_best(mode: str) -> float:
    return float("inf") if mode == "targeted" else float("-inf")
