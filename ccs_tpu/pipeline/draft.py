"""Draft consensus generation (component C2, SURVEY.md §2.1).

Sparc-style backbone-anchored graph consensus
(/root/reference/docs/how-does-ccs-work.md:34-51): pick a backbone subread,
align the other subreads to it (orientation inferred per subread, edlib-style
banded edit alignment), accumulate weighted votes per backbone position for
substitutions/deletions/insertions, and emit the weighted-majority sequence.
Run as a cascade (accuracy-vs-passes.md:41-46): round 1 drafts against the
backbone, round 2 re-aligns against the round-1 draft (slower, more robust).

Output accuracy target is ~99% (how-does-ccs-work.md:46-47) — the Arrow
polisher fixes the rest.
"""

from __future__ import annotations

import dataclasses
from collections import Counter
from typing import Optional

import numpy as np

from ccs_tpu.ops import dna
from ccs_tpu.ops.align import align_with_retry, anchor_chain, guided_align


@dataclasses.dataclass
class DraftResult:
    draft: Optional[np.ndarray]      # int8 codes, or None on failure
    strands: list[int]               # per-subread inferred strand (0 fwd / 1 rev)
    mapped: list[bool]               # per-subread: aligned to backbone/draft?
    n_mapped: int = 0


def infer_orientation(read: np.ndarray, backbone: np.ndarray,
                      k: int = 13) -> tuple[int, int]:
    """Infer strand by anchor count: returns (strand, n_anchors)."""
    fwd = len(anchor_chain(read, backbone, k))
    rev = len(anchor_chain(dna.revcomp(read), backbone, k))
    return (0, fwd) if fwd >= rev else (1, rev)


def _pileup_consensus(tpl: np.ndarray, aligned_reads: list[np.ndarray],
                      min_identity: float = 0.60) -> tuple[Optional[np.ndarray], list[bool]]:
    """Align reads to tpl, vote, and emit the weighted-majority sequence."""
    T = len(tpl)
    sub_votes = np.zeros((T, 4), dtype=np.float64)
    del_votes = np.zeros(T, dtype=np.float64)
    cov = np.zeros(T, dtype=np.float64)
    ins_votes: list[Counter] = [Counter() for _ in range(T + 1)]
    mapped = []
    n_mapped = 0
    for read in aligned_reads:
        # affine KSW2-style costs (how-does-ccs-work.md:53-55): sub > 1-gap
        # (SMRT errors are indel-dominated) and long indels collapse into one
        # run, concentrating pileup votes at a single template position
        aln = guided_align(read, tpl, sub_cost=6, gap_cost=2, gap_open=2)
        if aln is None or aln.identity() < min_identity:
            mapped.append(False)
            continue
        mapped.append(True)
        n_mapped += 1
        # walk the cigar accumulating votes
        i = j = 0
        pending_ins: list[int] = []
        for length, op in aln.cigar:
            if op == "M":
                if pending_ins:
                    ins_votes[j][tuple(pending_ins)] += 1
                    pending_ins = []
                idx = np.arange(length)
                sub_votes[j + idx, read[i + idx]] += 1.0
                cov[j:j + length] += 1.0
                i += length
                j += length
            elif op == "D":
                if pending_ins:
                    ins_votes[j][tuple(pending_ins)] += 1
                    pending_ins = []
                del_votes[j:j + length] += 1.0
                cov[j:j + length] += 1.0
                j += length
            else:  # I
                pending_ins.extend(int(b) for b in read[i:i + length])
                i += length
        if pending_ins:
            ins_votes[j][tuple(pending_ins)] += 1
    if n_mapped == 0:
        return None, mapped

    out: list[int] = []
    half = np.maximum(cov / 2.0, 0.5)
    best_base = np.argmax(sub_votes, axis=1)
    best_count = sub_votes[np.arange(T), best_base]
    for j in range(T):
        # insertions before position j kept if a single variant clears half cov
        if ins_votes[j]:
            seq, cnt = ins_votes[j].most_common(1)[0]
            if cnt > max(cov[j] if j < T else cov[-1], 1) / 2.0:
                out.extend(seq)
        if del_votes[j] > best_count[j]:
            continue  # deleted
        if cov[j] > 0:
            out.append(int(best_base[j]))
        else:
            out.append(int(tpl[j]))  # uncovered: keep backbone base
    if ins_votes[T]:
        seq, cnt = ins_votes[T].most_common(1)[0]
        if cnt > max(cov[-1] if T else 1, 1) / 2.0:
            out.extend(seq)
    return np.asarray(out, dtype=np.int8), mapped


def generate_draft(subreads: list[np.ndarray],
                   full_length: list[bool],
                   max_draft_coverage: int = 16,
                   rounds: int = 2) -> DraftResult:
    """Backbone pick + cascade pileup consensus.

    Backbone = median-length full-length subread (falls back to any subread).
    Orientation of every subread is inferred against the backbone; the
    returned ``strands`` are relative to the backbone orientation.
    """
    n = len(subreads)
    if n == 0:
        return DraftResult(None, [], [], 0)
    fl_idx = [i for i in range(n) if full_length[i]] or list(range(n))
    lengths = np.asarray([len(subreads[i]) for i in fl_idx])
    backbone_i = fl_idx[int(np.argsort(lengths, kind="stable")[len(lengths) // 2])]
    backbone = subreads[backbone_i]

    strands = []
    oriented = []
    for i in range(n):
        if i == backbone_i:
            strands.append(0)
            oriented.append(subreads[i])
            continue
        s, _ = infer_orientation(subreads[i], backbone)
        strands.append(s)
        oriented.append(dna.revcomp(subreads[i]) if s else subreads[i])

    # draft votes from up to max_draft_coverage subreads (backbone included)
    vote_idx = list(range(n))[:max_draft_coverage]
    tpl = backbone
    mapped_last = [True] * n
    for _ in range(rounds):
        draft, mapped = _pileup_consensus(tpl, [oriented[i] for i in vote_idx])
        if draft is None or len(draft) == 0:
            return DraftResult(None, strands, [False] * n, 0)
        tpl = draft
        mapped_last = mapped
    # final mapped flags for ALL subreads vs the final draft
    mapped_all = []
    for i in range(n):
        if i < len(vote_idx):
            mapped_all.append(mapped_last[i])
        else:
            aln = guided_align(oriented[i], tpl)
            mapped_all.append(aln is not None and aln.identity() >= 0.60)
    return DraftResult(tpl, strands, mapped_all, sum(mapped_all))
