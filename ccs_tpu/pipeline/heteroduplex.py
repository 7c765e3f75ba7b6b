"""Heteroduplex / single-strand artifact detection (component C5).

/root/reference/docs/how-does-ccs-work.md:65-72: a heteroduplex is a >20bp
single difference between the two strands of the SMRTbell. Such molecules
fail with status HETERODUPLEXES (default mode); small heteroduplexes are
kept and only lower the local QV.

Detection here is anchor-span based (host, cheap): for every draft position
we compare the local read-span excess of forward-strand vs reverse-strand
subreads. A one-strand insertion of length L shows up as ~L extra read bases
over a short draft interval for every subread of that strand and none of the
other. We flag the ZMW when the median strand difference exceeds the
threshold anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

PROBE_STEP = 8     # draft positions between probes
PROBE_SPAN = 24    # span length (draft bases) measured at each probe


def strand_span_difference(rpos_list: Sequence[Optional[np.ndarray]],
                           strands: Sequence[int],
                           draft_len: int) -> np.ndarray:
    """Per-probe |median span excess fwd - median span excess rev|.

    Returns an array over probe positions (empty if either strand lacks
    mapped subreads).
    """
    T = draft_len
    if T < PROBE_SPAN * 2:
        return np.zeros(0, dtype=np.float64)
    probes = np.arange(0, T - PROBE_SPAN, PROBE_STEP)
    per_strand: dict[int, list[np.ndarray]] = {0: [], 1: []}
    for rpos, strand in zip(rpos_list, strands):
        if rpos is None:
            continue
        spans = rpos[probes + PROBE_SPAN] - rpos[probes]
        excess = spans.astype(np.float64) - PROBE_SPAN
        per_strand[strand].append(excess)
    if not per_strand[0] or not per_strand[1]:
        return np.zeros(0, dtype=np.float64)
    med_f = np.median(np.stack(per_strand[0]), axis=0)
    med_r = np.median(np.stack(per_strand[1]), axis=0)
    return np.abs(med_f - med_r)


def detect_heteroduplex(rpos_list: Sequence[Optional[np.ndarray]],
                        strands: Sequence[int],
                        draft_len: int,
                        min_len: int = 21) -> bool:
    """True if the strands differ by a single event of > min_len-1 bases."""
    diff = strand_span_difference(rpos_list, strands, draft_len)
    if len(diff) == 0:
        return False
    return bool(np.max(diff) >= min_len)
