"""Device (jnp) implementation of est's hot loop: GC correction applied
per k-mer and summed per window.

Reference semantics (QuicKmer.c:662-682, see pipelines/est.py for the
full parity notes): per k-mer the product corr[gc & 0x1FF] * depth is
computed in float32 and accumulated per window in float64; CN =
(window_sum / n_kmers) / (mean_depth / 2).

Numerics: window sums are SEGMENT sums (scatter-add per window id), not
a global prefix sum — a single float32 cumsum over n k-mers reaches
~1e10 at human scale (2 G k-mers x depth 25) where float32 spacing is
~1e3, destroying all precision in a prefix-difference. Per-window
accumulation only ever sums ~w_size (default 1000) products, keeping
float32 round-off at ~1e-6 relative regardless of genome size (verified
at 1.3e8 k-mers in tests/test_est.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_windows",))
def _segment_window_sums(prod, kstarts, kends, *, num_windows: int):
    n = prod.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.searchsorted(kstarts, pos, side="right").astype(jnp.int32) - 1
    idxc = jnp.clip(idx, 0, num_windows - 1)
    in_win = (idx >= 0) & (pos < kends[idxc])
    seg = jnp.where(in_win, idxc, num_windows)
    sums = jnp.zeros(num_windows + 1, jnp.float32)
    return sums.at[seg].add(prod, mode="promise_in_bounds")[:num_windows]


def corrected_window_sums(depth_u16, gc_bins, factors, kstarts, kends):
    """depth_u16: u32[n] (u16 values); gc_bins: i32[n]; factors f32[401];
    kstarts/kends: i32[W] window k-mer ranges (sorted, non-overlapping).
    Returns f32[W] per-window sums of float32 products."""
    prod = factors[gc_bins] * depth_u16.astype(jnp.float32)
    return _segment_window_sums(prod, kstarts, kends,
                                num_windows=int(kstarts.shape[0]))


def cn_values(depth_u16: np.ndarray, qgc: np.ndarray, factors: np.ndarray,
              windows: np.ndarray, mean_depth: float) -> np.ndarray:
    """CN per window (device path). windows: i64[W, 4] rows
    (start_bp, end_bp, kstart, kend)."""
    gc = (qgc & 0x1FF).astype(np.int32)
    sums = corrected_window_sums(
        jnp.asarray(depth_u16.astype(np.uint32)), jnp.asarray(gc),
        jnp.asarray(np.asarray(factors, np.float32)),
        jnp.asarray(windows[:, 2].astype(np.int32)),
        jnp.asarray(windows[:, 3].astype(np.int32)))
    sums = np.asarray(sums, dtype=np.float64)
    nk = (windows[:, 3] - windows[:, 2]).astype(np.float64)
    return sums / nk / (mean_depth / 2.0)
