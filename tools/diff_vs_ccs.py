#!/usr/bin/env python3
"""Differential harness: ccs_tpu vs the reference `ccs` binary on real data.

The reference validates releases on fixed real datasets
(/root/reference/docs/faq/performance.md:99-106); this harness runs BOTH
tools on the same subreads.bam and diffs everything a release
qualification would look at:

- per-ZMW status concordance (ours vs theirs, from the two reports +
  per-read presence in the output BAMs),
- consensus sequence concordance for ZMWs both tools pass (exact match
  rate, edit distance distribution, orientation-free),
- predicted-accuracy (rq) agreement (mean |delta|, histogram),
- report count tables side by side.

How to obtain the inputs (no network in this build environment, so the
harness exits with instructions when they are missing):

  # reference binary (statically linked; docs/faq/bioconda-binary.md):
  conda install -c bioconda pbccs        # or:
  wget https://anaconda.org/bioconda/pbccs/.../pbccs-*.tar.bz2 && untar

  # a small public subreads sample, e.g. from PacBio's public datasets
  # (https://www.pacb.com/connect/datasets/) or SRA (e.g. HG002 subreads).

Usage:
  python tools/diff_vs_ccs.py --ccs-bin /path/to/ccs \
      --subreads subreads.bam --workdir /tmp/diff [--limit-zmws 2000]

Output: <workdir>/concordance.json + a text summary on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def run_tool(cmd: list[str], log_path: str) -> None:
    print(f"[diff] running: {' '.join(cmd)}", flush=True)
    with open(log_path, "w") as log:
        subprocess.run(cmd, check=True, stdout=log, stderr=subprocess.STDOUT)


def read_ccs_bam(path: str):
    """hole -> (seq codes int8, rq float) from a ccs output BAM."""
    from ccs_tpu.io.bam import BamReader
    out = {}
    with BamReader(path) as r:
        for rec in r:
            hole = rec.tag("zm", None)
            if hole is None:
                # name fallback: movie/hole/ccs
                try:
                    hole = int(rec.name.split("/")[1])
                except (IndexError, ValueError):
                    continue
            out[int(hole)] = (np.asarray(rec.seq, dtype=np.int8),
                              float(rec.tag("rq", -1.0)))
    return out


def edit_distance(a: np.ndarray, b: np.ndarray) -> int:
    from ccs_tpu.ops import dna
    from ccs_tpu.ops.align import guided_align

    def dist(x, y):
        aln = guided_align(np.asarray(x, np.int8), np.asarray(y, np.int8),
                           band=64)
        if aln is None:
            return max(len(x), len(y))
        mm = 0
        i = j = 0
        for ln, op in aln.cigar:
            if op == "M":
                mm += int((np.asarray(x[i:i + ln]) !=
                           np.asarray(y[j:j + ln])).sum())
                i += ln
                j += ln
            elif op == "I":
                mm += ln
                i += ln
            else:
                mm += ln
                j += ln
        return mm

    return min(dist(a, b), dist(a, dna.revcomp(np.asarray(b, np.int8))))


def parse_report(path: str) -> dict:
    counts = {}
    if not os.path.exists(path):
        return counts
    with open(path) as fh:
        for line in fh:
            if ":" in line:
                key, _, rest = line.partition(":")
                tok = rest.split()
                if tok and tok[0].replace(",", "").isdigit():
                    counts[key.strip()] = int(tok[0].replace(",", ""))
    return counts


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ccs-bin", default="ccs",
                    help="path to the reference ccs binary (bioconda pbccs)")
    ap.add_argument("--subreads", required=True)
    ap.add_argument("--workdir", default="diff_vs_ccs.out")
    ap.add_argument("--limit-zmws", type=int, default=0,
                    help="diff only the first N holes (0 = all)")
    ap.add_argument("--ccs-args", default="",
                    help="extra args for the reference binary")
    args = ap.parse_args()

    if not os.path.exists(args.subreads):
        print(f"subreads BAM not found: {args.subreads}\n\n{__doc__}")
        return 2
    from shutil import which
    if which(args.ccs_bin) is None and not os.path.exists(args.ccs_bin):
        print(f"reference ccs binary not found: {args.ccs_bin}\n\n{__doc__}")
        return 2

    os.makedirs(args.workdir, exist_ok=True)
    ref_bam = os.path.join(args.workdir, "ref.ccs.bam")
    ref_report = os.path.join(args.workdir, "ref.ccs_report.txt")
    our_bam = os.path.join(args.workdir, "ours.ccs.bam")
    our_report = os.path.join(args.workdir, "ours.ccs_report.txt")

    run_tool([args.ccs_bin, args.subreads, ref_bam,
              "--report-file", ref_report]
             + (args.ccs_args.split() if args.ccs_args else []),
             os.path.join(args.workdir, "ref.log"))
    run_tool([sys.executable, "-m", "ccs_tpu", args.subreads, our_bam,
              "--report-file", our_report],
             os.path.join(args.workdir, "ours.log"))

    ref = read_ccs_bam(ref_bam)
    ours = read_ccs_bam(our_bam)
    holes = sorted(set(ref) | set(ours))
    if args.limit_zmws:
        holes = holes[:args.limit_zmws]

    both = [h for h in holes if h in ref and h in ours]
    only_ref = [h for h in holes if h in ref and h not in ours]
    only_ours = [h for h in holes if h not in ref and h in ours]

    exact = 0
    dists, rq_deltas = [], []
    for h in both:
        sr, rr = ref[h]
        so, ro = ours[h]
        d = 0 if (len(sr) == len(so) and np.array_equal(sr, so)) \
            else edit_distance(so, sr)
        if d == 0:
            exact += 1
        dists.append(d / max(len(sr), 1))
        if rr >= 0 and ro >= 0:
            rq_deltas.append(abs(rr - ro))

    dists = np.asarray(dists) if dists else np.zeros(0)
    rq_deltas = np.asarray(rq_deltas) if rq_deltas else np.zeros(0)
    out = {
        "n_holes_considered": len(holes),
        "n_pass_both": len(both),
        "n_pass_only_reference": len(only_ref),
        "n_pass_only_ours": len(only_ours),
        "exact_sequence_match_frac": round(exact / max(len(both), 1), 4),
        "per_base_discordance_mean": float(dists.mean()) if len(dists) else None,
        "per_base_discordance_p95": float(np.percentile(dists, 95))
        if len(dists) else None,
        "rq_abs_delta_mean": float(rq_deltas.mean()) if len(rq_deltas) else None,
        "rq_abs_delta_p95": float(np.percentile(rq_deltas, 95))
        if len(rq_deltas) else None,
        "report_reference": parse_report(ref_report),
        "report_ours": parse_report(our_report),
    }
    path = os.path.join(args.workdir, "concordance.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))
    print(f"[diff] wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
