"""Candidate exact-engine kernel shapes, measured device-only.

The flat/exact engine has been stuck at ~0.5x the C baseline for three
rounds (VERDICT r3 Next #1). This bench measures the REAL candidate
shapes end-to-end (gather + compare + scatter), not just primitives:

  packed2   — current engine: 2x32B bucket-row gathers + scatter-add
  mono64    — single-hash bucket: 1x64B row (8 entries x (hi,lo) 8B),
              compare 8, scatter-add at slot index (no rank gather —
              depth accumulates in slot order, permuted once at finish)
  *_pp      — ping-pong accumulator variants: two depth arrays
              alternated across loop iterations, merged at the end —
              breaks the scatter->scatter dependency chain so iteration
              i+1's gathers can overlap iteration i's scatter
  scat2     — two half-batch scatters into two accumulators in ONE
              iteration (tests whether independent scatter streams
              issue concurrently)
  sortjoin  — the sort-merge-join engine (ops.sortjoin), bounded sizes
              with a hard subprocess timeout upstream (this bench is
              run under `timeout`), smallest first

Timing protocol from bench.py: loops inside one jit; dispatch->fetch
minus measured round-trip (the tunnel's block_until_ready does not
await remote completion).

Usage: python tools/microbench_exact.py [expt ...]
       expts: probes sortjoin sorts   (default: probes)
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NQ = 1 << 22          # k-mer queries per iteration
ITERS = 8
LOGN = 22             # dictionary n = 4M (bench.py scale)


def measure_lat():
    @jax.jit
    def trivial(x):
        return x + 1
    np.asarray(trivial(jnp.int32(0)))
    t0 = time.time()
    np.asarray(trivial(jnp.int32(1)))
    return time.time() - t0


def honest_time(fn, *args, lat, n=3):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        ts.append(time.time() - t0)
    return max(min(ts) - lat, 1e-9)


def probes(lat, rng):
    n = 1 << LOGN
    # two-choice packed layout: n buckets (load .5, C=2), 32B rows
    nb2 = n
    rows2 = jnp.asarray(rng.integers(0, 2**31, size=(nb2, 8)).astype(np.uint32))
    # mono layout: C=8 entries of (hi,lo), load .25 -> n/2 buckets, 64B
    nb1 = n >> 1
    rows1 = jnp.asarray(rng.integers(0, 2**31, size=(nb1, 16)).astype(np.uint32))
    qhi = jnp.asarray(rng.integers(0, 2**31, size=NQ).astype(np.uint32))
    qlo = jnp.asarray(rng.integers(0, 2**31, size=NQ).astype(np.uint32))

    def h2(q, i, m):
        return ((q * jnp.uint32(2654435761) + i) >> 7) & jnp.uint32(m - 1)

    # NOTE scatter realism: with random table content every compare
    # would miss and all lanes would scatter-add the SAME trash index —
    # a pathological collision pattern the real engine (mostly-hit
    # batches, distinct ranks) never produces. The compares run for
    # VPU-work realism, but the scatter index mixes gathered words so
    # its distribution matches the real mostly-hit case.

    def probe2(hi, lo, i, depth):
        i1 = ((hi ^ lo) + i) & jnp.uint32(nb2 - 1)
        i2 = h2(hi ^ lo, i, nb2)
        r1 = rows2[i1.astype(jnp.int32)]
        r2 = rows2[i2.astype(jnp.int32)]
        rank = jnp.zeros(hi.shape, jnp.uint32)
        for r in (r1, r2):
            for e in range(2):
                m = (r[:, 4 * e] == hi) & (r[:, 4 * e + 1] == lo)
                rank = jnp.where(m, r[:, 4 * e + 2], rank ^ r[:, 4 * e + 2])
        return depth.at[(rank & jnp.uint32(n - 1)).astype(jnp.int32)].add(
            1, mode="promise_in_bounds")

    def probe1(hi, lo, i, depth):
        i1 = ((hi ^ lo) + i) & jnp.uint32(nb1 - 1)
        r = rows1[i1.astype(jnp.int32)]
        ent = jnp.zeros(hi.shape, jnp.uint32)
        for e in range(8):
            m = (r[:, 2 * e] == hi) & (r[:, 2 * e + 1] == lo)
            ent = jnp.where(m, jnp.uint32(e), ent ^ r[:, 2 * e])
        slot = i1 * 8 + (ent & jnp.uint32(7))
        return depth.at[slot.astype(jnp.int32)].add(1, mode="promise_in_bounds")

    def run(name, probe, depth_n, pp):
        @jax.jit
        def many(qhi, qlo):
            d0 = jnp.zeros(depth_n + 8, jnp.uint32)
            if pp:
                def body(i, ds):
                    a, b = ds
                    return (probe(qhi, qlo, jnp.uint32(i), b), a)
                a, b = jax.lax.fori_loop(0, ITERS, body, (d0, d0 + 0))
                return (a + b)[:8]
            def body(i, d):
                return probe(qhi, qlo, jnp.uint32(i), d)
            return jax.lax.fori_loop(0, ITERS, body, d0)[:8]
        t = honest_time(many, qhi, qlo, lat=lat)
        print(f"{name:24s}: {NQ * ITERS / t / 1e6:8.1f} M kmers/s", flush=True)

    run("packed2 (2x32B+scat)", probe2, n, pp=False)
    run("packed2 ping-pong", probe2, n, pp=True)
    run("mono64 (1x64B+scat)", probe1, nb1 * 8, pp=False)
    run("mono64 ping-pong", probe1, nb1 * 8, pp=True)

    # two independent half-batch scatters inside one iteration
    idx = jnp.asarray(rng.integers(0, n, size=NQ).astype(np.int32))

    @jax.jit
    def scat1(idx):
        def body(i, d):
            return d.at[(idx + i) & (n - 1)].add(1, mode="promise_in_bounds")
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(n, jnp.uint32))[:8]
    t = honest_time(scat1, idx, lat=lat)
    print(f"{'scatter-only':24s}: {NQ * ITERS / t / 1e6:8.1f} M adds/s", flush=True)

    @jax.jit
    def scat2(idx):
        h = NQ // 2
        ia, ib = idx[:h], idx[h:]
        def body(i, ds):
            a, b = ds
            return (a.at[(ia + i) & (n - 1)].add(1, mode="promise_in_bounds"),
                    b.at[(ib + i) & (n - 1)].add(1, mode="promise_in_bounds"))
        a, b = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros(n, jnp.uint32), jnp.zeros(n, jnp.uint32)))
        return (a + b)[:8]
    t = honest_time(scat2, idx, lat=lat)
    print(f"{'scatter 2-stream':24s}: {NQ * ITERS / t / 1e6:8.1f} M adds/s", flush=True)

    @jax.jit
    def scat_pp(idx):
        def body(i, ds):
            a, b = ds
            return (b.at[(idx + i) & (n - 1)].add(1, mode="promise_in_bounds"), a)
        a, b = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros(n, jnp.uint32), jnp.zeros(n, jnp.uint32)))
        return (a + b)[:8]
    t = honest_time(scat_pp, idx, lat=lat)
    print(f"{'scatter ping-pong':24s}: {NQ * ITERS / t / 1e6:8.1f} M adds/s", flush=True)


def sortjoin(lat, rng):
    """A/B sweep for DepthCounter layout="auto" (VERDICT r4 Next #3).

    The 3-operand 2-key sort COMPILES in ~109 s at 1.3 M lanes and its
    compile time explodes super-linearly with lane count (5.2 M lanes
    did not finish in 13+ min — the round-3 "stall": XLA sort
    compilation, not execution). The production engine
    (ops.sortjoin.SortJoinEngine) therefore sorts FIXED 2^20-lane query
    tiles compiled once; this sweep measures the per-kmer rate as a
    function of dictionary size n (the dict lanes ride every tile, so
    rate ~ lane_rate * q/(n+q)) — the numbers behind
    AUTO_SORTJOIN_MAX_N in pipelines/count.py."""
    from quickmer2_tpu.ops.sortjoin import sortjoin_count_batch
    for logn, logq in ((14, 20), (17, 20), (19, 20), (18, 20)):
        n, q = 1 << logn, 1 << logq
        dk = np.sort(rng.choice(np.arange(1, 1 << 60, dtype=np.uint64),
                                size=n, replace=False)) \
            if False else np.sort(
                rng.integers(1, 1 << 60, size=n, dtype=np.uint64))
        dhi = jnp.asarray((dk >> np.uint64(32)).astype(np.uint32))
        dlo = jnp.asarray(dk.astype(np.uint32))
        qk = rng.integers(1, 1 << 60, size=q, dtype=np.uint64)
        qhi = jnp.asarray((qk >> np.uint64(32)).astype(np.uint32))
        qlo = jnp.asarray(qk.astype(np.uint32))
        depth = jnp.zeros(n + 1, jnp.uint32)
        t0 = time.time()
        depth = sortjoin_count_batch(dhi, dlo, qhi, qlo, depth, n_dict=n)
        np.asarray(depth[:8])
        compile_s = time.time() - t0
        ts = []
        for _ in range(2):
            t0 = time.time()
            depth = sortjoin_count_batch(dhi, dlo, qhi, qlo, depth, n_dict=n)
            np.asarray(depth[:8])
            ts.append(time.time() - t0)
        t = max(min(ts) - lat, 1e-9)
        print(f"sortjoin n=2^{logn} q=2^{logq}: {q / t / 1e6:8.1f} M kmers/s "
              f"({(n + q) / t / 1e6:.0f} M lanes/s; compile {compile_s:.0f}s)",
              flush=True)


def sorts(lat, rng):
    for logn in (20, 22, 24):
        nq = 1 << logn
        a = jnp.asarray(rng.integers(0, 2**31, size=nq).astype(np.uint32))
        b = jnp.asarray(rng.integers(0, 2**31, size=nq).astype(np.uint32))
        c = jnp.asarray(rng.integers(0, 2**31, size=nq).astype(np.uint32))

        for ops, nk, name in ((1, 1, "1op"), (2, 1, "2op-1key"),
                              (3, 2, "3op-2key"), (4, 2, "4op-2key")):
            operands = (a, b, c, a)[:ops]

            @jax.jit
            def s(*xs, nk=nk):
                return jax.lax.sort(xs, num_keys=nk)[0][:8] \
                    if len(xs) > 1 else jax.lax.sort(xs[0])[:8]
            t = honest_time(s, *operands, lat=lat)
            print(f"sort {name} n=2^{logn}: {nq / t / 1e6:8.1f} M lanes/s",
                  flush=True)


def main():
    import os
    if os.environ.get("QM2_BENCH_PLATFORM"):   # the axon plugin force-sets
        jax.config.update("jax_platforms",     # the env var; config wins
                          os.environ["QM2_BENCH_PLATFORM"])
    expts = sys.argv[1:] or ["probes"]
    rng = np.random.default_rng(0)
    lat = measure_lat()
    print(f"# backend {jax.default_backend()}, latency {lat * 1e3:.1f} ms, "
          f"NQ=2^22, n=2^{LOGN}")
    for e in expts:
        {"probes": probes, "sortjoin": sortjoin, "sorts": sorts}[e](lat, rng)


if __name__ == "__main__":
    main()
