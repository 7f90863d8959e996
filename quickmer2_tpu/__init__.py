"""quickmer2_tpu — a TPU-native k-mer copy-number engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
KiddLab/QuicK-mer2 (reference: /root/reference/QuicKmer.c): alignment-free
paralog-specific copy-number estimation from whole-genome sequencing reads.

Pipeline phases (mirroring the reference's three-phase design,
QuicKmer.c:1485-1494, but architected TPU-first):

  search  — build a unique-k-mer dictionary from a reference genome
            (sort-based tabulation + batched edit-distance neighbor filter)
  count   — stream sample reads, probe the dictionary with vectorized
            gathers, accumulate per-k-mer depth with scatter-add
  est     — GC-corrected (LOWESS) windowed copy-number estimation
  sparse  — thin a dictionary / regenerate window+GC companions
  index   — build a dictionary from a precomputed k-mer BED list

On-disk formats (.qm/.qgc/.bed/.bin/.txt/CN-bed) interoperate byte-level
with the reference (SURVEY.md section 4).
"""

__version__ = "0.1.0"

from quickmer2_tpu.config import (  # noqa: F401
    CountConfig,
    EstConfig,
    SearchConfig,
)
