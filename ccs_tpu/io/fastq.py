"""bgzipped FASTQ writer (reference output format: index.md:55-58)."""

from __future__ import annotations

import numpy as np

from ccs_tpu.io.bgzf import BgzfWriter
from ccs_tpu.ops import dna
from ccs_tpu.pipeline.qvbin import qv_to_ascii


class FastqWriter:
    def __init__(self, path_or_fileobj, level: int = 6):
        self._w = BgzfWriter(path_or_fileobj, level=level)

    def write(self, name: str, seq: np.ndarray, qual: np.ndarray) -> None:
        self._w.write(b"@" + name.encode() + b"\n")
        self._w.write(dna.decode(seq) + b"\n+\n")
        self._w.write(qv_to_ascii(qual) + b"\n")

    def close(self) -> None:
        self._w.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
