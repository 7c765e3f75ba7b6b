"""ccs_tpu — TPU-native circular consensus sequencing (HiFi) engine.

A from-scratch re-implementation of the capabilities of PacBio's closed-source
``ccs`` tool (reference docs surveyed in SURVEY.md), designed TPU-first:

- host side: BAM/pbi/FASTQ I/O, windowing bookkeeping, stitching, reports
- device side: batched JAX/Pallas DP kernels (alignment, Arrow-style pair-HMM
  forward/backward, mutation scoring) over thousands of ZMWs per chip
- scale-out: data-parallel ZMW sharding over a ``jax.sharding.Mesh``
  (the TPU analog of ``ccs --chunk`` + merge; /root/reference/docs/faq/parallelize.md:7-29)
"""

__version__ = "0.1.0"

from ccs_tpu.statuses import ZmwStatus  # noqa: F401
from ccs_tpu.config import CcsConfig  # noqa: F401
