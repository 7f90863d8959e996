"""Multi-device count: data-parallel read shards x dictionary-sharded
probe table, composed with shard_map over a ("data", "dict") Mesh.

Architecture (no reference counterpart — the reference is single-host
pthreads; this is the communication backend SURVEY.md section 5 calls
for):

  * the host splits each code batch into `dp` chunks overlapping by
    k-1 codes (no window lost at shard boundaries, mirroring the
    single-device carry);
  * the probe table and rank map are split into `ds` contiguous slot
    blocks, each padded with a halo on both sides; probes walk toward
    the table middle (bidirectional rule), so any probe that starts in
    a core block stays within core+halo for cluster lengths < halo;
  * inside shard_map every device receives its data chunk (broadcast
    along "dict") and its table block (broadcast along "data"),
    processes only the lanes whose home slot is in its core block, and
    scatter-adds into a private dense depth partial;
  * partials live as depth[dp, ds, n+1] sharded P("data", "dict");
    the final merge is one jnp.sum over the device axes — XLA lowers
    it to an all-reduce over ICI (the psum analog of the reference's
    atomic u16 adds).

Determinism: scatter-add on TPU is deterministic, shard boundaries are
static, and the final reduction has a fixed order — identical .bin
across runs and mesh shapes (verified in tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quickmer2_tpu.dictionary import Dictionary
from quickmer2_tpu.ops import codec
from quickmer2_tpu.ops.codec import SEP
from quickmer2_tpu.ops.hash import djb_pair

DEFAULT_HALO = 4096


def shard_table(dic: Dictionary, ds: int, halo: int = DEFAULT_HALO):
    """Split table+rank into ds contiguous blocks with two-sided halo.

    Returns (thi[ds, L], tlo[ds, L], rank[ds, L], block) with
    L = block + 2*halo; out-of-range halo regions are empty slots with
    sentinel rank (safe: probes terminate on empty)."""
    h = dic.hash_size
    assert h % ds == 0, "hash_size must divide by dict shards"
    block = h // ds
    thi_full, tlo_full, rank_full = dic.device_arrays()
    L = block + 2 * halo
    thi = np.zeros((ds, L), np.uint32)
    tlo = np.zeros((ds, L), np.uint32)
    rank = np.full((ds, L), dic.n_kmers, np.int32)
    for i in range(ds):
        lo = i * block - halo
        hi = (i + 1) * block + halo
        src_lo, src_hi = max(lo, 0), min(hi, h)
        dst_lo = src_lo - lo
        thi[i, dst_lo : dst_lo + src_hi - src_lo] = thi_full[src_lo:src_hi]
        tlo[i, dst_lo : dst_lo + src_hi - src_lo] = tlo_full[src_lo:src_hi]
        rank[i, dst_lo : dst_lo + src_hi - src_lo] = rank_full[src_lo:src_hi]
    return thi, tlo, rank, block


def split_codes_overlap(batch: np.ndarray, dp: int, k: int) -> np.ndarray:
    """Split a code batch into dp chunks with k-1 overlap → [dp, chunk].
    len(batch) must be dp*c for c = ceil(len/dp); pad with SEP first."""
    n = len(batch)
    chunk = -(-n // dp)
    padded = np.full(dp * chunk + (k - 1), SEP, np.uint8)
    padded[:n] = batch
    out = np.empty((dp, chunk + k - 1), np.uint8)
    for i in range(dp):
        out[i] = padded[i * chunk : (i + 1) * chunk + (k - 1)]
    return out


def make_sharded_count_step(mesh: Mesh, k: int, hash_size: int, block: int,
                            halo: int, n_kmers: int, max_steps: int = 512):
    """Build the jitted sharded count step.

    Signature: step(codes[dp, C], thi[ds, L], tlo[ds, L], rank[ds, L],
                    depth[dp, ds, n+1]) -> depth
    """
    dp = mesh.shape["data"]
    ds = mesh.shape["dict"]

    def local_step(codes, thi, tlo, rank, depth):
        # codes [1, C]; thi/tlo/rank [1, L]; depth [1, 1, n+1]
        codes = codes[0]
        thi, tlo, rank = thi[0], tlo[0], rank[0]
        my_dict = jax.lax.axis_index("dict")
        block_lo = my_dict.astype(jnp.uint32) * jnp.uint32(block)

        chi, clo, valid = codec.sliding_kmers(codes, k)
        idx0 = djb_pair(chi, clo) & jnp.uint32(hash_size - 1)
        mine = valid & (idx0 - block_lo < jnp.uint32(block))
        step_dir = jnp.where(idx0 & jnp.uint32(hash_size >> 1), -1, 1).astype(jnp.int32)
        # local index into the haloed block; foreign lanes wrap in u32 and
        # clamp to `block` (a valid in-array index, masked by `mine`)
        off = jnp.minimum(idx0 - block_lo, jnp.uint32(block))
        idx = off.astype(jnp.int32) + halo

        def probe_once(idx):
            ehi = thi[idx]
            elo = tlo[idx]
            return (ehi == chi) & (elo == clo), (ehi == 0) & (elo == 0)

        def cond(state):
            _, done, it = state
            return (~jnp.all(done)) & (it < max_steps)

        def body(state):
            idx, done, it = state
            idx = jnp.where(done, idx, idx + step_dir)
            match, empty = probe_once(idx)
            done = done | match | empty
            return idx, done, it + 1

        match0, empty0 = probe_once(idx)
        done0 = (~mine) | match0 | empty0
        idx, _, _ = jax.lax.while_loop(cond, body, (idx, done0, jnp.int32(0)))
        r = jnp.where(mine, rank[idx], jnp.int32(n_kmers))
        new_depth = depth[0, 0].at[r].add(1, mode="promise_in_bounds")
        return new_depth[None, None]

    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data", None), P("dict", None), P("dict", None),
                  P("dict", None), P("data", "dict", None)),
        out_specs=P("data", "dict", None))
    return jax.jit(smapped, donate_argnums=(4,))


class ShardedDepthCounter:
    """Multi-device DepthCounter: same feed/finish interface as the
    single-device version, device placement via NamedSharding."""

    def __init__(self, dictionary: Dictionary, mesh: Mesh,
                 batch_bases: int = 1 << 24, halo: int = DEFAULT_HALO):
        self.dict = dictionary
        self.mesh = mesh
        self.k = dictionary.kmer_size
        self.batch_bases = batch_bases
        self.dp = mesh.shape["data"]
        self.ds = mesh.shape["dict"]
        halo = min(halo, dictionary.hash_size // self.ds)
        self.halo = halo
        thi, tlo, rank, block = shard_table(dictionary, self.ds, halo)
        sh_dict = NamedSharding(mesh, P("dict", None))
        self.table_hi = jax.device_put(thi, sh_dict)
        self.table_lo = jax.device_put(tlo, sh_dict)
        self.rank = jax.device_put(rank, sh_dict)
        self.block = block
        n = dictionary.n_kmers
        self.depth = jax.device_put(
            np.zeros((self.dp, self.ds, n + 1), np.uint32),
            NamedSharding(mesh, P("data", "dict", None)))
        self._step = make_sharded_count_step(
            mesh, self.k, dictionary.hash_size, block, halo, n)
        self._sh_data = NamedSharding(mesh, P("data", None))
        self._carry = np.zeros(0, np.uint8)
        self._pending: list[np.ndarray] = []
        self._pending_len = 0

    def feed_codes(self, chunk: np.ndarray) -> None:
        self._pending.append(chunk)
        self._pending_len += len(chunk)
        while self._pending_len + len(self._carry) >= self.batch_bases:
            buf = np.concatenate([self._carry] + self._pending)
            self._pending = [buf[self.batch_bases :]]
            self._pending_len = len(self._pending[0])
            self._run(buf[: self.batch_bases])

    def _run(self, batch: np.ndarray) -> None:
        shards = split_codes_overlap(batch, self.dp, self.k)
        codes = jax.device_put(shards, self._sh_data)
        self.depth = self._step(codes, self.table_hi, self.table_lo,
                                self.rank, self.depth)
        self._carry = batch[-(self.k - 1):].copy()

    def finish(self) -> np.ndarray:
        if self._pending_len:
            buf = np.concatenate([self._carry] + self._pending)
            pad = np.full(self.batch_bases - len(buf) % self.batch_bases, SEP, np.uint8)
            buf = np.concatenate([buf, pad])
            for off in range(0, len(buf), self.batch_bases):
                self._run(buf[off : off + self.batch_bases])
            self._pending, self._pending_len = [], 0
        total = jnp.sum(self.depth, axis=(0, 1), dtype=jnp.uint32)
        return np.asarray(jax.device_get(total))[:-1]
