import sys, time
import numpy as np
import jax, jax.numpy as jnp

def honest_time(fn, *args, lat, n=3):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        ts.append(time.time() - t0)
    return max(min(ts) - lat, 1e-9)

NQ = 1 << 22
NB = 1 << 21
ITERS = 8
rng = np.random.default_rng(0)

@jax.jit
def trivial(x): return x + 1
np.asarray(trivial(jnp.int32(0)))
t0 = time.time(); np.asarray(trivial(jnp.int32(1))); lat = time.time() - t0
print(f"# latency {lat*1e3:.1f} ms")

idx = jnp.asarray(rng.integers(0, NB, size=NQ).astype(np.int32))
idx_sorted = jnp.sort(idx)

# scatter with unique_indices (indices here are NOT unique but measure the mode)
uq = rng.permutation(NB).astype(np.int32)[: NQ] if NQ <= NB else None
@jax.jit
def scat_u(idx):
    def body(i, acc):
        return acc.at[(idx + i) & (NB - 1)].add(1, mode="promise_in_bounds",
                                                unique_indices=True)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(NB, jnp.uint32))[:8]
if uq is not None:
    t = honest_time(scat_u, jnp.asarray(uq), lat=lat)
    print(f"scatter-add unique_indices:  {len(uq)*ITERS/t/1e6:8.1f} M adds/s")

# scatter sorted indices
@jax.jit
def scat(idx):
    def body(i, acc):
        return acc.at[(idx + i) & (NB - 1)].add(1, mode="promise_in_bounds")
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(NB, jnp.uint32))[:8]
t = honest_time(scat, idx_sorted, lat=lat)
print(f"scatter-add sorted idx:      {NQ*ITERS/t/1e6:8.1f} M adds/s")

# gather sorted idx 16B
table4 = jnp.asarray(rng.integers(0, 2**31, size=(NB, 4)).astype(np.uint32))
@jax.jit
def gath(idx, table):
    def body(i, acc):
        return acc + table[(idx + i) & (NB - 1)][:, 0]
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(NQ, jnp.uint32))[:8]
t = honest_time(gath, idx_sorted, table4, lat=lat)
print(f"gather 16B sorted idx:       {NQ*ITERS/t/1e6:8.1f} M rows/s")

# gather from small tables (VMEM-resident?)
for lognb in (10, 14, 17, 21):
    nb = 1 << lognb
    tbl = jnp.asarray(rng.integers(0, 2**31, size=(nb, 4)).astype(np.uint32))
    @jax.jit
    def gs(idx, table):
        def body(i, acc):
            return acc + table[(idx + i) & (nb - 1)][:, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(NQ, jnp.uint32))[:8]
    t = honest_time(gs, idx, tbl, lat=lat)
    print(f"gather 16B table 2^{lognb:2d} rows: {NQ*ITERS/t/1e6:8.1f} M rows/s")

# scatter-add row of 4 u32 (one descriptor, 16B payload)
vals = jnp.asarray(rng.integers(0, 3, size=(NQ, 4)).astype(np.uint32))
@jax.jit
def scat_row(idx, vals):
    def body(i, acc):
        return acc.at[(idx + i) & (NB - 1)].add(vals, mode="promise_in_bounds")
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((NB, 4), jnp.uint32))[:8, 0]
t = honest_time(scat_row, idx, vals, lat=lat)
print(f"scatter-add 16B rows:        {NQ*ITERS/t/1e6:8.1f} M rows/s")

# device sorts
keys32 = jnp.asarray(rng.integers(0, 2**31, size=NQ).astype(np.uint32))
hi = jnp.asarray(rng.integers(0, 2**31, size=NQ).astype(np.uint32))
@jax.jit
def sort1(k):
    def body(i, acc):
        return jax.lax.sort(k ^ acc[0])
    return jax.lax.fori_loop(0, 2, body, k)[:8]
t = honest_time(sort1, keys32, lat=lat)
print(f"sort u32 n=2^22 (x2):        {NQ*2/t/1e6:8.1f} M keys/s")

@jax.jit
def sort2(hi, lo):
    s = jax.lax.sort((hi, lo, lo), num_keys=2)
    return s[0][:8]
t = honest_time(sort2, hi, keys32, lat=lat)
print(f"sort 2key+payload n=2^22:    {NQ/t/1e6:8.1f} M keys/s")
