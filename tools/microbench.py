"""TPU primitive microbenchmarks that drive the probe-kernel design.

Measures the op-issue/bandwidth walls for the access patterns the count
and search hot paths are built from: random row gathers at several row
widths, scatter-adds, and device sorts. Loops run inside one jitted
graph (honest protocol from bench.py: the tunnel's block_until_ready
does not await remote completion, so we time dispatch->host-fetch and
subtract measured round-trip latency).

Usage: python tools/microbench.py [n_log2]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def honest_time(fn, *args, lat, n=3):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        ts.append(time.time() - t0)
    return max(min(ts) - lat, 1e-9)


def main():
    nq_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    NQ = 1 << nq_log2           # queries per iter
    NB = 1 << 21                # table buckets
    ITERS = 8
    rng = np.random.default_rng(0)

    @jax.jit
    def trivial(x):
        return x + 1
    np.asarray(trivial(jnp.int32(0)))
    t0 = time.time()
    np.asarray(trivial(jnp.int32(1)))
    lat = time.time() - t0
    print(f"# latency {lat*1e3:.1f} ms, NQ={NQ}, table buckets={NB}")

    idx = jnp.asarray(rng.integers(0, NB, size=NQ).astype(np.int32))

    # --- row gathers at several widths -------------------------------
    for w in (1, 2, 4, 8, 16, 32, 128):
        table = jnp.asarray(rng.integers(0, 2**31, size=(NB, w)).astype(np.uint32))

        @jax.jit
        def many(idx, table):
            def body(i, acc):
                r = table[(idx + i) & (NB - 1)]
                return acc + r[:, 0]
            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros(NQ, jnp.uint32))[:8]
        t = honest_time(many, idx, table, lat=lat)
        rate = NQ * ITERS / t
        print(f"gather rows w={w:4d}u32 ({4*w:4d}B): {rate/1e6:8.1f} M rows/s  "
              f"({rate*4*w/1e9:7.1f} GB/s)")

    # --- scatter-add -------------------------------------------------
    @jax.jit
    def scat(idx):
        def body(i, acc):
            return acc.at[(idx + i) & (NB - 1)].add(1, mode="promise_in_bounds")
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros(NB, jnp.uint32))[:8]
    t = honest_time(scat, idx, lat=lat)
    print(f"scatter-add u32:            {NQ*ITERS/t/1e6:8.1f} M adds/s")

    # --- gather+gather+scatter (current probe shape) ------------------
    table8 = jnp.asarray(rng.integers(0, 2**31, size=(NB, 8)).astype(np.uint32))

    @jax.jit
    def probe_shape(idx, table):
        def body(i, acc):
            i1 = (idx + i) & (NB - 1)
            i2 = (idx * 7 + i) & (NB - 1)
            r1 = table[i1]
            r2 = table[i2]
            r = jnp.where((r1[:, 0] & 1) > 0, r1[:, 2], r2[:, 2])
            return acc.at[r & (NB - 1)].add(1, mode="promise_in_bounds")
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros(NB, jnp.uint32))[:8]
    t = honest_time(probe_shape, idx, table8, lat=lat)
    print(f"2xgather(32B)+scatter:      {NQ*ITERS/t/1e6:8.1f} M probes/s")

    # --- single gather + scatter --------------------------------------
    @jax.jit
    def probe1_shape(idx, table):
        def body(i, acc):
            r1 = table[(idx + i) & (NB - 1)]
            return acc.at[r1[:, 2] & (NB - 1)].add(1, mode="promise_in_bounds")
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros(NB, jnp.uint32))[:8]
    t = honest_time(probe1_shape, idx, table8, lat=lat)
    print(f"1xgather(32B)+scatter:      {NQ*ITERS/t/1e6:8.1f} M probes/s")

    # wider bucket, one gather
    table32 = jnp.asarray(rng.integers(0, 2**31, size=(NB // 4, 32)).astype(np.uint32))

    @jax.jit
    def probe1w_shape(idx, table):
        def body(i, acc):
            r1 = table[((idx + i) & (NB // 4 - 1))]
            hit = (r1[:, ::4] & 255) == 7
            rank = jnp.max(jnp.where(hit, r1[:, 2::4], 0), axis=1)
            return acc.at[rank & (NB - 1)].add(1, mode="promise_in_bounds")
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros(NB, jnp.uint32))[:8]
    t = honest_time(probe1w_shape, idx, table32, lat=lat)
    print(f"1xgather(128B,8ent)+scatter:{NQ*ITERS/t/1e6:8.1f} M probes/s")

    # --- device sort --------------------------------------------------
    keys32 = jnp.asarray(rng.integers(0, 2**31, size=NQ).astype(np.uint32))
    keys_hi = jnp.asarray(rng.integers(0, 2**31, size=NQ).astype(np.uint32))

    @jax.jit
    def sort1(k):
        return jax.lax.sort(k)[:8]
    t = honest_time(sort1, keys32, lat=lat)
    print(f"sort u32 n={NQ}:            {NQ/t/1e6:8.1f} M keys/s")

    @jax.jit
    def sort2(hi, lo):
        s = jax.lax.sort((hi, lo), num_keys=2)
        return s[0][:8]
    t = honest_time(sort2, keys_hi, keys32, lat=lat)
    print(f"sort (u32,u32) 2-key:       {NQ/t/1e6:8.1f} M keys/s")

    @jax.jit
    def sort3(hi, lo):
        s = jax.lax.sort((hi, lo, lo), num_keys=2)
        return s[0][:8]
    t = honest_time(sort3, keys_hi, keys32, lat=lat)
    print(f"sort 2-key + payload:       {NQ/t/1e6:8.1f} M keys/s")

    # --- scatter/gather mode + locality variants (ex-microbench2) ----
    idx_sorted = jnp.sort(idx)
    uq = jnp.asarray(rng.permutation(NB).astype(np.int32)[: min(NQ, NB)])

    @jax.jit
    def scat_u(idx):
        def body(i, acc):
            return acc.at[(idx + i) & (NB - 1)].add(
                1, mode="promise_in_bounds", unique_indices=True)
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros(NB, jnp.uint32))[:8]
    t = honest_time(scat_u, uq, lat=lat)
    print(f"scatter-add unique_indices: {int(uq.shape[0])*ITERS/t/1e6:8.1f} M adds/s")

    t = honest_time(scat, idx_sorted, lat=lat)
    print(f"scatter-add sorted idx:     {NQ*ITERS/t/1e6:8.1f} M adds/s")

    # gathers from small tables (VMEM-resident candidates)
    for lognb in (10, 14, 17, 21):
        nb = 1 << lognb
        tbl = jnp.asarray(rng.integers(0, 2**31, size=(nb, 4)).astype(np.uint32))

        @jax.jit
        def gs(idx, table, nb=nb):
            def body(i, acc):
                return acc + table[(idx + i) & (nb - 1)][:, 0]
            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros(NQ, jnp.uint32))[:8]
        t = honest_time(gs, idx, tbl, lat=lat)
        print(f"gather 16B table 2^{lognb:2d} rows:{NQ*ITERS/t/1e6:8.1f} M rows/s")

    # scatter-add 16B rows (one descriptor, 4-u32 payload)
    vals = jnp.asarray(rng.integers(0, 3, size=(NQ, 4)).astype(np.uint32))

    @jax.jit
    def scat_row(idx, vals):
        def body(i, acc):
            return acc.at[(idx + i) & (NB - 1)].add(
                vals, mode="promise_in_bounds")
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros((NB, 4), jnp.uint32))[:8, 0]
    t = honest_time(scat_row, idx, vals, lat=lat)
    print(f"scatter-add 16B rows:       {NQ*ITERS/t/1e6:8.1f} M rows/s")


if __name__ == "__main__":
    main()
