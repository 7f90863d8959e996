"""Prototype: sort-merge join count kernel. Measures throughput and
verifies counts vs numpy."""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

def honest_time(fn, *args, lat, n=3):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        ts.append(time.time() - t0)
    return max(min(ts) - lat, 1e-9)

NDICT = 1 << 21
NQ = 1 << 22
ITERS = 4
rng = np.random.default_rng(0)

# dict: sorted unique (hi, lo) 60-bit keys
keys = np.unique(rng.integers(0, 1 << 60, size=NDICT + 1000, dtype=np.uint64))[:NDICT]
dhi = (keys >> 32).astype(np.uint32)
dlo = (keys & 0xFFFFFFFF).astype(np.uint32)
# queries: 80% dict hits, 20% random
qk = np.where(rng.random(NQ) < 0.8,
              keys[rng.integers(0, NDICT, size=NQ)],
              rng.integers(0, 1 << 60, size=NQ, dtype=np.uint64))
qhi = (qk >> 32).astype(np.uint32)
qlo = (qk & 0xFFFFFFFF).astype(np.uint32)

SENT = np.uint32(0xFFFFFFFF)

@partial(jax.jit, static_argnames=("n_dict",), donate_argnums=(4,))
def sortjoin_count(dhi, dlo, qhi, qlo, depth, *, n_dict):
    n = n_dict
    hi = jnp.concatenate([dhi, qhi])
    lo = jnp.concatenate([dlo, qlo])
    # payload: rank+1 for dict lanes, 0 for queries
    pay = jnp.concatenate([
        jnp.arange(1, n + 1, dtype=jnp.uint32),
        jnp.zeros(qhi.shape[0], jnp.uint32)])
    hi, lo, pay = jax.lax.sort((hi, lo, pay), num_keys=2)
    # run heads
    same_prev = jnp.concatenate([
        jnp.zeros(1, bool),
        (hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1])])
    head = ~same_prev
    # segment id per lane
    seg = jnp.cumsum(head.astype(jnp.uint32)) - 1
    # rank+1 of the (unique) dict lane in each run: segmented max.
    # forward segmented max via associative_scan on (head, val)
    def comb(a, b):
        ah, av = a
        bh, bv = b
        return (ah | bh, jnp.where(bh, bv, jnp.maximum(av, bv)))
    _, fwd = jax.lax.associative_scan(comb, (head, pay))
    # backward
    _, bwd = jax.lax.associative_scan(comb, (head[::-1],
                                             pay[::-1]))
    run_rank = jnp.maximum(fwd, bwd[::-1])     # rank+1, 0 if none
    # queries per run: total lanes in run minus dict lanes in run
    isq = (pay == 0).astype(jnp.uint32)
    _, qf = jax.lax.associative_scan(
        lambda a, b: (a[0] | b[0], jnp.where(b[0], b[1], a[1] + b[1])),
        (head, isq))
    _, qb = jax.lax.associative_scan(
        lambda a, b: (a[0] | b[0], jnp.where(b[0], b[1], a[1] + b[1])),
        (head[::-1], isq[::-1]))
    qcount = qf + qb[::-1] - isq               # total queries in run
    # head lanes emit (run_rank-1 or SENT, qcount)
    key2 = jnp.where(head & (run_rank > 0), run_rank - 1, SENT)
    val2 = jnp.where(head, qcount, jnp.uint32(0))
    key2, val2 = jax.lax.sort((key2, val2), num_keys=1)
    return depth.at[:n].add(val2[:n])

@jax.jit
def trivial(x): return x + 1
np.asarray(trivial(jnp.int32(0)))
t0 = time.time(); np.asarray(trivial(jnp.int32(1))); lat = time.time() - t0

depth0 = jnp.zeros(NDICT, jnp.uint32)
dhi_d, dlo_d = jnp.asarray(dhi), jnp.asarray(dlo)
qhi_d, qlo_d = jnp.asarray(qhi), jnp.asarray(qlo)

# correctness
out = np.asarray(sortjoin_count(dhi_d, dlo_d, qhi_d, qlo_d,
                                jnp.zeros(NDICT, jnp.uint32), n_dict=NDICT))
ref = np.zeros(NDICT, np.uint64)
srt = np.searchsorted(keys, qk)
srt = np.clip(srt, 0, NDICT - 1)
hit = keys[srt] == qk
np.add.at(ref, srt[hit], 1)
print("correct:", np.array_equal(out.astype(np.uint64), ref))

@partial(jax.jit, static_argnames=("n_dict",))
def many(dhi, dlo, qhi, qlo, *, n_dict):
    def body(i, depth):
        return sortjoin_count(dhi, dlo, qhi, qlo + i, depth, n_dict=n_dict)
    return jax.lax.fori_loop(0, ITERS, body,
                             jnp.zeros(n_dict, jnp.uint32))[:8]

t = honest_time(partial(many, n_dict=NDICT), dhi_d, dlo_d, qhi_d, qlo_d, lat=lat)
rate = NQ * ITERS / t
print(f"sortjoin: {rate/1e6:.1f} M queries/s (dict {NDICT}, batch {NQ})")
