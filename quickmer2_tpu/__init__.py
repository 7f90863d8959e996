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


def _enable_persistent_compile_cache() -> None:
    """Persistent XLA compilation cache (JAX official) — on by default.

    The heavy kernels (multi-operand sorts, the Hamming-join slabs,
    the anchored tiers) cost tens of seconds to compile, and on a
    remote-attached TPU backend the compile round-trips dominate cold
    runs (measured: a 151 s sort compile replays from cache in 4 s in
    a fresh process). Opt out with QM2_JAX_CACHE=0; point elsewhere
    with QM2_JAX_CACHE=/path."""
    import os
    loc = os.environ.get("QM2_JAX_CACHE", "")
    if loc == "0":
        return
    try:
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            loc or os.path.expanduser("~/.cache/quickmer2_tpu/jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — cache is best-effort
        pass


_enable_persistent_compile_cache()

from quickmer2_tpu.config import (  # noqa: F401
    CountConfig,
    EstConfig,
    SearchConfig,
)
