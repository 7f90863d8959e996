"""DJB2 hashing and open-addressing probe, host and device paths.

Reference semantics (QuicKmer.c:66-99):
  * hash = DJB2 over the 8 little-endian bytes of the u64 k-mer code,
    masked to Hash_size-1 (Hash_size a power of two).
  * probe: linear scan; start slots in the upper half of the table scan
    downward, lower half scan upward ("bidirectional" probing). The scan
    stops at an empty slot (code 0) or a match. No bounds check — safety
    comes from low fill plus the toward-the-middle scan direction.
  * k-mer code 0 (poly-A/T) therefore "matches" the first empty slot
    (SURVEY.md Q3); callers must treat slot hits on empty slots as
    out-of-dictionary.

Because Hash_size <= 2^32, the probe index only needs the LOW 32 bits of
the 64-bit DJB value, and DJB2 mod 2^32 is computable entirely in uint32
arithmetic — so the device path never touches 64-bit integers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DJB_SEED = 5381


def djb_u64_np(kmer: np.ndarray) -> np.ndarray:
    """Low 32 bits of DJB2 over the 8 LE bytes of u64 codes (numpy)."""
    kmer = np.asarray(kmer, dtype=np.uint64)
    h = np.full(kmer.shape, DJB_SEED, dtype=np.uint32)
    for i in range(8):
        byte = ((kmer >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.uint32)
        h = h * np.uint32(33) + byte
    return h


def djb_pair_np(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    h = np.full(np.shape(lo), DJB_SEED, dtype=np.uint32)
    for word in (np.asarray(lo, np.uint32), np.asarray(hi, np.uint32)):
        for i in range(4):
            h = h * np.uint32(33) + ((word >> np.uint32(8 * i)) & np.uint32(0xFF))
    return h


def djb_pair(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Device DJB2 (low 32 bits) over a (hi, lo) u32 pair."""
    h = jnp.full(lo.shape, DJB_SEED, dtype=jnp.uint32)
    for word in (lo, hi):
        for i in range(4):
            h = h * jnp.uint32(33) + ((word >> (8 * i)) & jnp.uint32(0xFF))
    return h


# ---------------------------------------------------------------------------
# Host table: build / probe (numpy + tight python where order-dependent)
# ---------------------------------------------------------------------------

def scan_direction_np(idx0: np.ndarray, hash_size: int) -> np.ndarray:
    """+1 for lower-half start slots, -1 for upper-half (QuicKmer.c:92-94)."""
    return np.where(idx0 & np.uint32(hash_size >> 1), -1, 1).astype(np.int64)


def build_table_np(keys: np.ndarray, hash_size: int) -> np.ndarray:
    """Insert u64 keys (in order) into a fresh open-addressing table.

    Returns table u64[hash_size] with 0 = empty. Keys must be nonzero and
    should be distinct; a duplicate lands on its existing slot (no-op).
    Placement follows the reference probe rule so the resulting table is
    readable by the reference binary. This is the slow-but-exact host
    fallback; the native C builder (native/qm2core.c) is the fast path.
    """
    table = np.zeros(hash_size, dtype=np.uint64)
    probe_insert_np(table, keys, hash_size)
    return table


def probe_insert_np(table: np.ndarray, keys: np.ndarray, hash_size: int) -> np.ndarray:
    """Insert keys into an existing table in order; returns slot per key."""
    idx0 = djb_u64_np(keys) & np.uint32(hash_size - 1)
    step = scan_direction_np(idx0, hash_size)
    out = np.empty(len(keys), dtype=np.int64)
    for i in range(len(keys)):
        j = int(idx0[i])
        s = int(step[i])
        k = keys[i]
        while table[j] and table[j] != k:
            j += s
        table[j] = k
        out[i] = j
    return out


def probe_lookup_np(table: np.ndarray, keys: np.ndarray, hash_size: int):
    """Vectorized host lookup. Returns (slot i64[N], found bool[N]).

    found is True when the scan terminated on a matching nonzero slot;
    a key of 0 "finds" the first empty slot with found=True, mirroring
    the reference quirk Q3 — callers mask with the dictionary chain.
    """
    keys = np.asarray(keys, dtype=np.uint64)
    idx = (djb_u64_np(keys) & np.uint32(hash_size - 1)).astype(np.int64)
    step = scan_direction_np(idx, hash_size)
    active = np.ones(len(keys), dtype=bool)
    while active.any():
        entry = table[idx[active]]
        k = keys[active]
        done = (entry == k) | (entry == 0)
        idx[active] += np.where(done, 0, step[active])
        nxt = active.copy()
        nxt[active] = ~done
        active = nxt
    return idx, table[idx] == keys


# ---------------------------------------------------------------------------
# Device probe (vectorized gather loop over u32 pair tables)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("hash_size", "max_steps"))
def probe_lookup(table_hi: jax.Array, table_lo: jax.Array,
                 khi: jax.Array, klo: jax.Array,
                 hash_size: int, max_steps: int = 4096):
    """Vectorized dictionary probe on device.

    table_{hi,lo}: u32[hash_size] split key table (0,0 = empty slot).
    k{hi,lo}:      u32[N] query canonical codes.
    Returns (slot i32[N], found bool[N]).

    All lanes step together in a while_loop; each iteration is one gather
    per word. Expected probe length at fill <= 0.8 is ~3; max_steps only
    bounds pathological clusters.
    """
    n = klo.shape[0]
    idx0 = djb_pair(khi, klo) & jnp.uint32(hash_size - 1)
    step = jnp.where(idx0 & jnp.uint32(hash_size >> 1), -1, 1).astype(jnp.int32)
    idx = idx0.astype(jnp.int32)

    def probe_once(idx):
        ehi = table_hi[idx]
        elo = table_lo[idx]
        match = (ehi == khi) & (elo == klo)
        empty = (ehi == 0) & (elo == 0)
        return match, empty

    def cond(state):
        _, done, _, it = state
        return (~jnp.all(done)) & (it < max_steps)

    def body(state):
        idx, done, found, it = state
        idx = jnp.where(done, idx, idx + step)
        match, empty = probe_once(idx)
        found = found | (~done & match)
        done = done | match | empty
        return idx, done, found, it + 1

    match0, empty0 = probe_once(idx)
    state = (idx, match0 | empty0, match0, jnp.int32(0))
    idx, done, found, _ = jax.lax.while_loop(cond, body, state)
    return idx, found
