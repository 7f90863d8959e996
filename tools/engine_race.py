"""Realistic exact-engine race: candidate probe layouts on genome-read
batches (the spill/flat shape) with REAL tables — the decisive harness
for the flat-engine choice (bench.py's exact_diag measures the two
shipped engines; this additionally races experimental layouts).

Engines:
  packed2  — two-choice 32B rows, 2 gathers, scatter at rank
             (sequential for clean reads)
  mono8    — single-hash 64B rows of 8x(hi,lo), 1 gather, scatter at
             SLOT (hash-random)
  mono5r   — single-hash 64B rows of 5x(hi,lo,rank), 1 gather, scatter
             at RANK (sequential) — combines mono's gather count with
             packed's scatter locality
  mono8u16 — mono8 scattering into a u16 depth (HBM traffic halved;
             .bin parity is mod-65536 anyway)

Usage: python tools/engine_race.py [reads_log2]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("QM2_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["QM2_BENCH_PLATFORM"])

from quickmer2_tpu.ops import codec                      # noqa: E402
from quickmer2_tpu.ops.hash import djb_pair, djb_pair_np  # noqa: E402

K = 30
GENOME = 1 << 22
READ_LEN = 150
ITERS = 4


def build():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, size=GENOME).astype(np.uint8)
    canon, valid = codec.sliding_kmers_np(g, K)
    kmers = canon[valid & (canon != 0)]
    uniq, counts = np.unique(kmers, return_counts=True)
    dict_kmers = uniq[counts == 1]
    order = np.argsort(
        np.searchsorted(np.sort(dict_kmers), dict_kmers))  # arbitrary rank
    # rank by genome order for scatter locality realism
    _, first = np.unique(kmers, return_index=True)
    firsts = dict(zip(uniq.tolist(), first.tolist()))
    pos = np.array([firsts[k] for k in dict_kmers.tolist()])
    by_pos = np.argsort(pos)
    in_order = dict_kmers[by_pos]
    return rng, g, in_order


def read_batch(rng, g, R, err=0.0):
    starts = rng.integers(0, GENOME - READ_LEN, size=R)
    reads = g[starts[:, None] + np.arange(READ_LEN)[None, :]].copy()
    if err:
        ne = rng.binomial(R * READ_LEN, err)
        er = rng.integers(0, R, size=ne)
        ec = rng.integers(0, READ_LEN, size=ne)
        reads[er, ec] = (reads[er, ec] + rng.integers(1, 4, size=ne)) % 4
    return reads


def lanes_of(reads_d, R):
    flat = reads_d.reshape(-1)
    chi_f, clo_f, valid_f = codec.sliding_kmers(flat, K)
    W = READ_LEN - K + 1
    pad = R * READ_LEN - chi_f.shape[0]
    chi = jnp.pad(chi_f, (0, pad)).reshape(R, READ_LEN)[:, :W].reshape(-1)
    clo = jnp.pad(clo_f, (0, pad)).reshape(R, READ_LEN)[:, :W].reshape(-1)
    valid = jnp.pad(valid_f, (0, pad)).reshape(R, READ_LEN)[:, :W].reshape(-1)
    return chi, clo, valid


def main():
    rlog = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    R = 1 << rlog
    W = READ_LEN - K + 1
    rng, g, in_order = build()
    n = len(in_order)
    khi, klo = codec.split_u64(in_order)
    print(f"# dict {n} kmers, {R} reads x{ITERS} iters, backend "
          f"{jax.default_backend()}", flush=True)

    @jax.jit
    def trivial(x):
        return x + 1
    np.asarray(trivial(jnp.int32(0)))
    t0 = time.time()
    np.asarray(trivial(jnp.int32(1)))
    lat = time.time() - t0

    reads = read_batch(rng, g, R, err=0.003)
    reads_d = jnp.asarray(reads)

    def timed(fn, *args):
        np.asarray(jax.tree.leaves(fn(*args))[0])
        ts = []
        for _ in range(2):
            t0 = time.time()
            np.asarray(jax.tree.leaves(fn(*args))[0])
            ts.append(time.time() - t0)
        t = max(min(ts) - lat, 1e-9)
        return R * W * ITERS / t

    # --- packed2 ------------------------------------------------------
    from quickmer2_tpu.ops.packed_table import PackedTable, probe_packed
    pt = PackedTable.build(khi, klo,
                           rank=np.arange(n, dtype=np.uint32))
    prows = jnp.asarray(pt.rows)

    @jax.jit
    def run_packed(reads_d, rows, depth):
        chi, clo, valid = lanes_of(reads_d, R)

        def body(i, depth):
            trash = depth.shape[0] - 1
            f, r, _ = probe_packed(rows, chi, clo, pt.n_buckets,
                                   jnp.uint32(trash))
            idx = jnp.where(valid & f, r, jnp.uint32(trash)).astype(jnp.int32)
            return depth.at[idx].add(1, mode="promise_in_bounds")
        return jax.lax.fori_loop(0, ITERS, body, depth)[:8]

    rate = timed(run_packed, reads_d, prows, jnp.zeros(n + 1, jnp.uint32))
    print(f"packed2  : {rate / 1e6:8.1f} M kmers/s", flush=True)

    # --- mono8 --------------------------------------------------------
    from quickmer2_tpu.ops.monotable import MonoTable, probe_mono
    mt = MonoTable.build(khi, klo)
    mrows = jnp.asarray(mt.rows)

    def mk_mono8(dtype):
        @jax.jit
        def run(reads_d, rows, depth):
            chi, clo, valid = lanes_of(reads_d, R)

            def body(i, depth):
                trash = depth.shape[0] - 1
                f, slot, _ = probe_mono(rows, chi, clo, mt.n_buckets)
                idx = jnp.where(valid & f, slot,
                                jnp.uint32(trash)).astype(jnp.int32)
                return depth.at[idx].add(dtype(1), mode="promise_in_bounds")
            return jax.lax.fori_loop(0, ITERS, body, depth)[:8]
        return run

    rate = timed(mk_mono8(jnp.uint32), reads_d, mrows,
                 jnp.zeros(mt.n_slots + 1, jnp.uint32))
    print(f"mono8    : {rate / 1e6:8.1f} M kmers/s", flush=True)
    rate = timed(mk_mono8(jnp.uint16), reads_d, mrows,
                 jnp.zeros(mt.n_slots + 1, jnp.uint16))
    print(f"mono8u16 : {rate / 1e6:8.1f} M kmers/s", flush=True)

    # --- mono5r: 5 entries x (hi,lo,rank), 64B row, scatter at rank ---
    C5 = 5
    load = 0.4
    nb5 = 1 << max(1, int(np.ceil(np.log2(n / (C5 * load)))))
    h = djb_pair_np(khi, klo)
    b = (h & np.uint32(nb5 - 1)).astype(np.int64)
    order = np.argsort(b, kind="stable")
    bs = b[order]
    first = np.ones(n, bool)
    first[1:] = bs[1:] != bs[:-1]
    start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
    entry = np.arange(n) - start
    fits = entry < C5
    rows5 = np.zeros((nb5, 16), np.uint32)
    sl = bs[fits] * C5 + entry[fits]
    rows5_flat = np.zeros((nb5 * C5, 3), np.uint32)
    keep = order[fits]
    rows5_flat[sl, 0] = khi[keep]
    rows5_flat[sl, 1] = klo[keep]
    rows5_flat[sl, 2] = np.arange(n, dtype=np.uint32)[keep]
    rows5[:, :15] = rows5_flat.reshape(nb5, 15)
    n_ovf5 = int((~fits).sum())
    rows5_d = jnp.asarray(rows5)
    print(f"# mono5r: {nb5} buckets, overflow {n_ovf5} keys "
          f"({n_ovf5 / n:.2%})", flush=True)

    @jax.jit
    def run_mono5r(reads_d, rows, depth):
        chi, clo, valid = lanes_of(reads_d, R)

        def body(i, depth):
            trash = depth.shape[0] - 1
            hq = djb_pair(chi, clo)
            i1 = hq & jnp.uint32(nb5 - 1)
            r = rows[i1.astype(jnp.int32)]
            nz = (chi | clo) != 0
            rank = jnp.full(chi.shape, trash, jnp.uint32)
            for e in range(C5):
                m = nz & (r[:, 3 * e] == chi) & (r[:, 3 * e + 1] == clo)
                rank = jnp.where(m, r[:, 3 * e + 2], rank)
            idx = jnp.where(valid, rank, jnp.uint32(trash)).astype(jnp.int32)
            return depth.at[idx].add(1, mode="promise_in_bounds")
        return jax.lax.fori_loop(0, ITERS, body, depth)[:8]

    rate = timed(run_mono5r, reads_d, rows5_d, jnp.zeros(n + 1, jnp.uint32))
    print(f"mono5r   : {rate / 1e6:8.1f} M kmers/s "
          f"(undercounts {n_ovf5 / n:.2%} side keys — layout race only)",
          flush=True)


if __name__ == "__main__":
    main()
