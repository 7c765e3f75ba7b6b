"""Tandem-repeat / low-complexity detection (component C13).

The reference runs a "modified version of the symmetric DUST algorithm
(sdust)" and flags ZMWs whose draft has a tandem repeat longer than
``--min-tandem-repeat-length`` (default 1000); flagged ZMWs get heuristics
disabled (/root/reference/docs/faq/low-complexity.md:7-18).

Implementation: DUST-style triplet duplication scoring in sliding windows
(vectorized NumPy), merged into maximal low-complexity intervals. Exact
sdust interval boundaries are not required by the contract — only whether a
long tandem repeat exists and roughly where.
"""

from __future__ import annotations

import numpy as np

DUST_WINDOW = 64
DUST_T = 2.0  # score threshold, as in DUST/sdust


def _triplet_codes(seq: np.ndarray) -> np.ndarray:
    s = np.clip(np.asarray(seq, dtype=np.int64), 0, 3)
    if len(s) < 3:
        return np.empty(0, dtype=np.int64)
    return s[:-2] * 16 + s[1:-1] * 4 + s[2:]


def dust_score_profile(seq: np.ndarray, window: int = DUST_WINDOW) -> np.ndarray:
    """Per-position DUST score: sum over triplets t of c_t*(c_t-1)/2 divided
    by (w-1), computed in a sliding window (one score per window start)."""
    trip = _triplet_codes(seq)
    n = len(trip)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    w = min(window - 2, n)  # triplets per window
    counts = np.zeros(64, dtype=np.int64)
    scores = np.empty(n - w + 1, dtype=np.float64)
    # incremental sliding-window score: adding a triplet with count c adds c
    score = 0
    for i in range(w):
        score += counts[trip[i]]
        counts[trip[i]] += 1
    scores[0] = score
    for i in range(1, n - w + 1):
        out = trip[i - 1]
        counts[out] -= 1
        score -= counts[out]
        inc = trip[i + w - 1]
        score += counts[inc]
        counts[inc] += 1
        scores[i] = score
    return scores / max(w - 1, 1)


def low_complexity_intervals(seq: np.ndarray, window: int = DUST_WINDOW,
                             threshold: float = DUST_T) -> list[tuple[int, int]]:
    """Maximal merged intervals whose windows exceed the DUST threshold."""
    scores = dust_score_profile(seq, window)
    if len(scores) == 0:
        return []
    w = min(window, len(seq))
    hot = scores > threshold
    intervals: list[tuple[int, int]] = []
    start = None
    for i, h in enumerate(hot):
        if h and start is None:
            start = i
        elif not h and start is not None:
            intervals.append((start, i - 1 + w))
            start = None
    if start is not None:
        intervals.append((start, len(hot) - 1 + w))
    # merge overlapping
    merged: list[tuple[int, int]] = []
    for a, b in intervals:
        if merged and a <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], b))
        else:
            merged.append((a, b))
    return merged


def max_tandem_repeat_length(seq: np.ndarray) -> int:
    """Length of the longest low-complexity/tandem-repeat interval."""
    iv = low_complexity_intervals(seq)
    return max((b - a for a, b in iv), default=0)


def has_long_tandem_repeat(seq: np.ndarray, min_len: int = 1000) -> bool:
    return max_tandem_repeat_length(seq) >= min_len
