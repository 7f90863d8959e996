"""Anchored range-add counting — the flagship fast path of the count
phase.

Insight: reads are contiguous substrings of the genome, and the
dictionary is stored in genome order (rank == genome order). On TPU,
random-access ops cost ~10ns each regardless of width (measured), so
the per-k-mer probe+scatter design pays ~3 random ops per k-mer. This
path instead pays O(1) random ops per READ:

  1. ANCHOR — probe a few k-mers of the read against the packed table
     (ops.packed_table rows carry each entry's genome end position);
  2. ALIGN+VERIFY — fetch the genome window implied by the anchor (row
     gathers over a (G/64, 64) tiling + log-shift alignment) for both
     strands, and compare bases;
  3. CLEAN RUNS — maximal runs of k-mers whose whole window matches the
     genome become range-adds on the rank axis: rank boundaries come
     from a sampled prefix-count structure (one row gather per
     boundary), and each run costs two scatter-adds into a difference
     array (depth = cumsum at finalize);
  4. DIRTY k-mers (windows touching a mismatch, up to a static cap per
     read) are individually probed — byte-identical semantics to the
     per-k-mer path;
  5. reads that exceed the caps (no anchor, too many runs/dirty k-mers)
     SPILL to the exact per-k-mer path.

Correctness does not depend on anchoring quality: any k-mer classified
clean provably equals the genome k-mer at its aligned position, whose
dictionary membership/rank is exactly what the prefix-count structure
encodes; everything else goes through the exact probe. Misanchoring
only moves k-mers from the fast path to the exact path. Differential
tests (tests/test_anchored.py) assert bit-identical depth vectors
against the direct path on adversarial inputs.
"""

from __future__ import annotations

import collections
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from quickmer2_tpu.ops import codec
from quickmer2_tpu.ops.packed_table import (
    PackedTable, probe_packed, probe_packed_np)

GBLK = 64          # genome tile width (bases) for row gathers
DBLK = 64          # prefix-count block size (positions per block)


@dataclasses.dataclass
class AnchoredIndex:
    """Device-side structures for anchored counting."""
    rows: jax.Array          # packed table rows (B, 16) incl. positions
    n_buckets: int
    genome_tiles: jax.Array  # u8[G/GBLK, GBLK]: bits 0-2 genome code,
    #                          bits 3-6 neighbor-hit flags (see
    #                          build_neighbor_bits)
    genome_len: int
    dblock: jax.Array        # u32[G/DBLK, 4]: [rank_base, mask_hi, mask_lo, 0]
    n_kmers: int
    has_neighbor_bits: bool = False
    host_rows: np.ndarray | None = None   # host copy of `rows` (derived
    #                          tables build from it without a D2H fetch)

    @classmethod
    def build(cls, genome_codes: np.ndarray, dict_end_pos: np.ndarray,
              kmers_in_order: np.ndarray, k: int,
              neighbor_bits: bool = True,
              device_build: bool = False,
              cache_path: str | None = None) -> "AnchoredIndex":
        """genome_codes: u8[G] concatenated code stream (with SEP between
        chromosomes); dict_end_pos: u32[n] global end position of each
        dictionary k-mer in rank order; kmers_in_order: u64[n].

        neighbor_bits=True additionally builds the single-substitution
        neighbor-hit bitmap and packs it into the genome tile bytes,
        letting the count kernel prove most error-containing reads
        contribute nothing through their dirty windows (no extra random
        accesses — the window fetch already brings the bytes).

        cache_path persists the expensive products (tiles incl. bitmap,
        per-rank positions) as a .qai companion (io.formats.write_qai) so
        later invocations load instead of rebuilding — the analog of the
        reference's derived artifacts built once at search time
        (QuicKmer.c:1023-1047)."""
        G = len(genome_codes)
        khi, klo = codec.split_u64(kmers_in_order)
        rank = np.arange(len(dict_end_pos), dtype=np.uint32)
        table = PackedTable.build(khi, klo, rank,
                                  pos=np.asarray(dict_end_pos, np.uint32))

        nbits = None
        if neighbor_bits:
            if device_build:
                # Hamming-join formulation (ops.hamming_join): dense VPU
                # compares instead of 3k packed probes per base — the
                # dominant one-time cost of the anchored path, measured
                # >=5x faster than the probe sweep (VERDICT r4 Next #6).
                # Bit-identical to the probe builders (tests).
                from quickmer2_tpu.ops.hamming_join import (
                    hamming_neighbor_bits)
                nbits = hamming_neighbor_bits(genome_codes, kmers_in_order, k)
            else:
                nbits = build_neighbor_bits(genome_codes, table.rows,
                                            table.n_buckets, k)
        tiles = genome_tiles_np(genome_codes, nbits)
        if cache_path:
            from quickmer2_tpu.io import formats
            from quickmer2_tpu.dictionary import content_fingerprint
            formats.write_qai(cache_path, k, G, tiles, dict_end_pos,
                              neighbor_bits,
                              content_fingerprint(kmers_in_order, k))
        return cls._assemble(tiles, G, dict_end_pos, table, neighbor_bits)

    @classmethod
    def _assemble(cls, tiles, G: int, dict_end_pos, table: PackedTable,
                  has_neighbor_bits: bool) -> "AnchoredIndex":
        dblock = build_dblock(np.asarray(dict_end_pos), G)
        return cls(jnp.asarray(table.rows), table.n_buckets,
                   jnp.asarray(np.ascontiguousarray(tiles)), G,
                   jnp.asarray(dblock), len(dict_end_pos),
                   has_neighbor_bits=has_neighbor_bits,
                   host_rows=table.rows)

    @staticmethod
    def estimate_hbm_bytes(n_kmers: int, genome_len: int,
                           dict_devices: int = 1) -> dict:
        """Per-device HBM budget of the anchored structures BEFORE
        building them (pipelines.count uses this to fall back to the
        flat dict-shardable path when they cannot fit — reference
        scale: a GRCh38 2³²-slot dictionary is ~49 GB on disk,
        tutorial.md:90-91, and the packed rows dominate here).

        rows   = n_buckets * 32 B / ds (two-choice buckets at load 0.5;
                 the dominant term splits over the "dict" mesh axis as
                 contiguous bucket blocks — parallel.anchored_parallel)
        tiles  = G bytes           (u8 code+flag per base, replicated)
        dblock = G/DBLK * 16 B     (prefix-count rows, replicated)
        """
        from quickmer2_tpu.ops import monotable
        from quickmer2_tpu.ops.packed_table import ENTRIES_PER_BUCKET
        ds = max(int(dict_devices), 1)
        n_buckets = 1 << max(1, int(np.ceil(np.log2(
            max(n_kmers, 1) / (ENTRIES_PER_BUCKET * 0.5)))))
        rows = n_buckets * 4 * ENTRIES_PER_BUCKET * 4 // ds
        tiles = -(-genome_len // GBLK) * GBLK
        dblock = -(-genome_len // DBLK) * 16
        # single-device counters also carry the mono spill table + its
        # slot accumulator (AnchoredDepthCounter mono_spill default);
        # the sharded counter (ds > 1) runs spills on the packed rows
        mono = 0
        if ds == 1:
            mb = 1 << max(1, int(np.ceil(np.log2(
                max(n_kmers, 1) / (monotable.ENTRIES * 0.5)))))
            mono = mb * 4 * monotable.ROW_WIDTH \
                + (mb * monotable.ENTRIES + 1) * 4
        return {"rows": rows, "tiles": tiles, "dblock": dblock,
                "mono_spill": mono, "dict_devices": ds,
                "total": rows + tiles + dblock + mono}

    @classmethod
    def load(cls, qai_path: str, dic) -> "AnchoredIndex":
        """Load a persisted .qai companion; the cheap derivations (dblock,
        packed rows) are rebuilt from it plus the dictionary. Raises
        ValueError when the artifact does not match the dictionary."""
        from quickmer2_tpu.io import formats
        k, G, tiles, pos, nb, fp = formats.read_qai(qai_path)
        if k != dic.kmer_size or len(pos) != dic.n_kmers:
            raise ValueError(
                f"{qai_path}: built for k={k}, n={len(pos)} but dictionary "
                f"has k={dic.kmer_size}, n={dic.n_kmers} — stale artifact")
        if fp != dic.fingerprint:
            raise ValueError(
                f"{qai_path}: dictionary content fingerprint mismatch "
                f"({fp:#018x} != {dic.fingerprint:#018x}) — the dictionary "
                f"was rebuilt with a different k-mer set; stale artifact")
        pos = np.asarray(pos, np.uint32)
        khi, klo = codec.split_u64(dic.kmers_in_order)
        rank = np.arange(dic.n_kmers, dtype=np.uint32)
        table = PackedTable.build(khi, klo, rank, pos=pos)
        return cls._assemble(tiles, G, pos, table, nb)

    @classmethod
    def from_dictionary_and_fasta(cls, dic, fasta_path: str,
                                  neighbor_bits: bool = True,
                                  cache_path: str | None = None,
                                  device_build: bool | None = None,
                                  ) -> "AnchoredIndex":
        """Recover genome stream + per-rank positions by scanning the
        reference FASTA against an (imported or built) Dictionary. With
        cache_path, an existing matching .qai is loaded instead (zero
        FASTA scanning) and a fresh build is persisted there.
        device_build: None = use the device bitmap builder when an
        accelerator backend is present (host numpy otherwise)."""
        import os
        if cache_path and os.path.exists(cache_path):
            try:
                return cls.load(cache_path, dic)
            except ValueError:
                pass  # stale artifact — rebuild and overwrite below
        if device_build is None:
            device_build = jax.default_backend() not in ("cpu",)
        stream, dict_pos = _genome_stream_and_positions(dic, fasta_path)
        return cls.build(stream, dict_pos, dic.kmers_in_order, dic.kmer_size,
                         neighbor_bits=neighbor_bits, cache_path=cache_path,
                         device_build=device_build)


def _genome_stream_and_positions(dic, fasta_path: str):
    """Concatenated genome code stream (one SEP between chromosomes) and
    the global END position of every dictionary k-mer in rank order."""
    from quickmer2_tpu.io import fasta as fasta_io
    from quickmer2_tpu.utils import native

    k = dic.kmer_size
    parts = []
    pos_parts = []
    offset = 0
    table = np.ascontiguousarray(dic.table)
    rank = dic.rank
    n = dic.n_kmers
    for name, seq in fasta_io.iter_fasta(fasta_path):
        codes = codec.encode_bases(np.frombuffer(seq, dtype=np.uint8))
        if native.available():
            canon, valid, _ = native.sliding_canon(codes, k)
        else:
            canon, valid = codec.sliding_kmers_np(codes, k)
        valid = valid & (canon != 0)
        if native.available():
            slots, found = native.lookup_keys(table, canon)
        else:
            from quickmer2_tpu.ops import hash as qhash
            slots, found = qhash.probe_lookup_np(table, canon, dic.hash_size)
        hit = valid & found & (rank[slots] < n)
        p_end = np.flatnonzero(hit) + (k - 1) + offset
        pos_parts.append(p_end.astype(np.uint32))
        parts.append(codes)
        parts.append(np.array([codec.SEP], np.uint8))
        offset += len(codes) + 1
    stream = np.concatenate(parts)[:-1] if parts else np.zeros(0, np.uint8)
    dict_pos = np.concatenate(pos_parts) if pos_parts else np.zeros(0, np.uint32)
    if len(dict_pos) != n:
        raise ValueError(
            f"genome scan found {len(dict_pos)} dictionary k-mers, "
            f"dictionary has {n} — wrong FASTA for this .qm?")
    return stream, dict_pos


def genome_tiles_np(genome_codes: np.ndarray,
                    neighbor_bits: np.ndarray | None = None) -> np.ndarray:
    """Pad the code stream to GBLK tiles (SEP padding). When
    neighbor_bits (u8[G], low 4 bits used) is given, each tile byte is
    code | bits << 3 — consumers mask with & 7 for the code."""
    G = len(genome_codes)
    ng = -(-G // GBLK)
    tiles = np.full(ng * GBLK, codec.SEP, np.uint8)
    tiles[:G] = genome_codes
    if neighbor_bits is not None:
        tiles[:G] |= (neighbor_bits.astype(np.uint8) & np.uint8(15)) << 3
    return tiles.reshape(ng, GBLK)


def build_neighbor_bits(genome_codes: np.ndarray, rows: np.ndarray,
                        n_buckets: int, k: int,
                        chunk: int = 1 << 22) -> np.ndarray:
    """Single-substitution neighbor-hit bitmap of the genome against the
    dictionary.

    Returns u8[G] where bit b of byte e is set iff substituting base b
    (genome strand) at genome position e inside ANY valid k-window
    produces a canonical k-mer that IS in the dictionary. In a unique-
    k-mer dictionary this is overwhelmingly rare, so the count kernel
    can use a zero byte as proof that every dirty window k-mer induced
    by a lone substitution at e misses the dictionary — replacing up to
    k probes per sequencing error with bits it already fetched.

    The reference has no counterpart (it pays the probes per read,
    QuicKmer.c:256-296); this is a derived per-dictionary artifact, like
    the .qgc, amortized across all samples counted against it.

    Host implementation: a one-byte-per-slot Bloom prefilter over the
    table keys (single random access per variant, ~1-2% pass rate on a
    unique-k-mer dictionary) followed by an exact packed-table probe of
    the survivors — ~10x faster than probing every variant. For large
    genomes prefer build_neighbor_bits_device (bit-identical output).
    """
    G = len(genome_codes)
    nb = np.zeros(G, np.uint8)
    if G < k:
        return nb
    member = _bloom_member_maker(rows, n_buckets)
    step = max(chunk, 4 * k)
    for off in range(0, G - k + 1, step):
        seg = genome_codes[off: off + step + k - 1]
        fwd, rc, valid = codec.sliding_fwd_rc_np(seg, k)
        vidx = np.flatnonzero(valid)
        if len(vidx) == 0:
            continue
        fwd, rc = fwd[vidx], rc[vidx]
        for i in range(k):
            base_i = seg[vidx + i]
            sh_f = np.uint64(2 * (k - 1 - i))
            sh_r = np.uint64(2 * i)
            f_clr = fwd & ~(np.uint64(3) << sh_f)
            r_clr = rc & ~(np.uint64(3) << sh_r)
            for b in range(4):
                sel = base_i != b
                if not sel.any():
                    continue
                mf = f_clr[sel] | (np.uint64(b) << sh_f)
                mr = r_clr[sel] | (np.uint64((b - 2) & 3) << sh_r)
                canon = np.minimum(mf, mr)
                khi, klo = codec.split_u64(canon)
                found = member(khi, klo)
                if found.any():
                    e = off + vidx[sel][found] + i
                    np.bitwise_or.at(nb, e, np.uint8(1 << b))
    return nb


def _bloom_member_maker(rows: np.ndarray, n_buckets: int):
    """Exact membership tester against a packed table: Bloom byte-map
    prefilter (sized ~64 slots/key, capped at 1 GiB) + packed probe of
    the candidates. Returns member(khi, klo) -> bool[N]."""
    khi_t = np.ascontiguousarray(rows[:, 0::4]).ravel()
    klo_t = np.ascontiguousarray(rows[:, 1::4]).ravel()
    nz = (khi_t | klo_t) != 0
    from quickmer2_tpu.ops.hash import djb_pair_np
    h = djb_pair_np(khi_t[nz], klo_t[nz])
    n = int(nz.sum())
    mbits = min(max(int(np.ceil(np.log2(max(n, 1) * 64))), 16), 30)
    bloom = np.zeros(1 << mbits, np.uint8)
    bloom[h & np.uint32((1 << mbits) - 1)] = 1

    def member(khi_q: np.ndarray, klo_q: np.ndarray) -> np.ndarray:
        hq = djb_pair_np(khi_q, klo_q)
        cand = bloom[hq & np.uint32((1 << mbits) - 1)] != 0
        out = np.zeros(len(khi_q), bool)
        ci = np.flatnonzero(cand)
        if len(ci):
            out[ci] = probe_packed_np(rows, khi_q[ci], klo_q[ci], n_buckets)
        return out

    return member


def build_dblock(dict_end_pos: np.ndarray, G: int) -> np.ndarray:
    """Sampled prefix-count structure over dictionary end positions:
    per DBLK-position block, [rank_base, bitmask_hi, bitmask_lo, 0]."""
    nb = -(-G // DBLK) + 1
    dblock = np.zeros((nb, 4), np.uint32)
    blk = np.asarray(dict_end_pos) // DBLK
    bit = np.asarray(dict_end_pos) % DBLK
    hi_mask = np.zeros(nb, np.uint64)
    lo_mask = np.zeros(nb, np.uint64)
    sel_hi = bit >= 32
    np.bitwise_or.at(hi_mask, blk[sel_hi],
                     np.uint64(1) << (bit[sel_hi] - 32).astype(np.uint64))
    np.bitwise_or.at(lo_mask, blk[~sel_hi],
                     np.uint64(1) << bit[~sel_hi].astype(np.uint64))
    counts = np.bincount(blk, minlength=nb)
    rank_base = np.concatenate([[0], np.cumsum(counts[:-1])]).astype(np.uint32)
    dblock[:, 0] = rank_base
    dblock[:, 1] = hi_mask.astype(np.uint32)
    dblock[:, 2] = lo_mask.astype(np.uint32)
    return dblock


def _set2(hi, lo, sh, val):
    """Set the 2-bit field at (traced, even) bit offset sh of a u64
    expressed as a (hi, lo) u32 pair. sh is always even (2*offset), so
    the field never straddles the word boundary."""
    in_lo = sh < 32
    sh_lo = jnp.where(in_lo, sh, 0).astype(jnp.uint32)
    sh_hi = jnp.where(in_lo, 0, sh - 32).astype(jnp.uint32)
    m_lo = jnp.where(in_lo, jnp.uint32(3) << sh_lo, jnp.uint32(0))
    m_hi = jnp.where(in_lo, jnp.uint32(0), jnp.uint32(3) << sh_hi)
    v = val.astype(jnp.uint32)
    lo2 = (lo & ~m_lo) | jnp.where(in_lo, v << sh_lo, jnp.uint32(0))
    hi2 = (hi & ~m_hi) | jnp.where(in_lo, jnp.uint32(0), v << sh_hi)
    return hi2, lo2


@functools.partial(jax.jit, static_argnames=("k", "n_buckets"))
def _neighbor_bits_kernel(codes, rows, *, k: int, n_buckets: int):
    """Device neighbor-bitmap build over one genome chunk: for every
    (window offset i, substitution delta d in 1..3) combination, mutate
    every valid window to base (orig + d) & 3, probe the packed table,
    and OR the hits into per-base bit planes. One fori_loop over the 3k
    combinations (the identity "mutation" is never probed — a 25%
    probe saving over the 4-base sweep, VERDICT r3 Next #4) — the
    mutation is 32-bit field surgery on the strand words, so the whole
    build is elementwise VPU work plus the probes."""
    G = codes.shape[0]
    N = G - k + 1
    fhi, flo, rhi, rlo, valid = codec.sliding_fwd_rc(codes, k)

    def body(i, acc):
        base_i = jax.lax.dynamic_slice(codes, (i,), (N,))
        chis, clos, nbs = [], [], []
        for d in range(1, 4):
            nb = (base_i + jnp.uint8(d)) & jnp.uint8(3)
            mfh, mfl = _set2(fhi, flo, 2 * (k - 1) - 2 * i, nb)
            mrh, mrl = _set2(rhi, rlo, 2 * i, (nb - jnp.uint8(2)) & jnp.uint8(3))
            fwd_less = (mfh < mrh) | ((mfh == mrh) & (mfl <= mrl))
            chis.append(jnp.where(fwd_less, mfh, mrh))
            clos.append(jnp.where(fwd_less, mfl, mrl))
            nbs.append(nb)
        f, _, _ = probe_packed(rows, jnp.stack(chis).reshape(-1),
                               jnp.stack(clos).reshape(-1), n_buckets,
                               jnp.uint32(0))
        fd = f.reshape(3, N) & valid[None, :]
        nb3 = jnp.stack(nbs)                       # (3, N) mutated bases
        hit = jnp.zeros((4, N), bool)
        for b in range(4):
            hit = hit.at[b].set(jnp.any(fd & (nb3 == b), axis=0))
        cur = jax.lax.dynamic_slice(acc, (0, i), (4, N))
        return jax.lax.dynamic_update_slice(acc, cur | hit, (0, i))

    acc = jnp.zeros((4, G), bool)
    acc = jax.lax.fori_loop(0, k, body, acc)
    return (acc[0].astype(jnp.uint8)
            | (acc[1].astype(jnp.uint8) << 1)
            | (acc[2].astype(jnp.uint8) << 2)
            | (acc[3].astype(jnp.uint8) << 3))


def build_neighbor_bits_device(genome_codes: np.ndarray, rows,
                               n_buckets: int, k: int,
                               chunk: int = 1 << 23) -> np.ndarray:
    """Device-accelerated build_neighbor_bits (bit-identical output).
    Transfers are just the genome codes up and the bitmap down; the 4k
    mutation/probe sweeps all run on device. Chunked with k-1 overlap so
    arbitrarily large genomes stream through fixed-shape compilations."""
    genome_codes = np.asarray(genome_codes, np.uint8)
    G = len(genome_codes)
    nb = np.zeros(G, np.uint8)
    if G < k:
        return nb
    rows = jnp.asarray(rows)
    step = max(chunk, 4 * k)
    pending = None                       # (off, take, out_device)
    for off in range(0, max(G - k + 1, 1), step):
        seg = genome_codes[off: off + step + k - 1]
        pad = 0
        if off > 0 and len(seg) < step + k - 1:
            pad = step + k - 1 - len(seg)
            seg = np.pad(seg, (0, pad), constant_values=codec.SEP)
        # dispatch chunk i's kernel BEFORE fetching chunk i-1's result:
        # the (async) H2D put and kernel dispatch overlap the previous
        # chunk's device compute and D2H fetch
        out = _neighbor_bits_kernel(jax.device_put(seg), rows,
                                    k=k, n_buckets=n_buckets)
        if pending is not None:
            poff, ptake, pout = pending
            nb[poff: poff + ptake] |= np.asarray(pout)[:ptake]
        pending = (off, len(seg) - pad, out)
    poff, ptake, pout = pending
    nb[poff: poff + ptake] |= np.asarray(pout)[:ptake]
    return nb


def _popcount32(x):
    return jax.lax.population_count(x)


def rank_at(dblock, q):
    """R(q) = number of dictionary end positions <= q (q: i32 global
    position, clamped to valid range by caller). One row gather."""
    blk = (q // DBLK).astype(jnp.int32)
    bit = (q % DBLK).astype(jnp.uint32)
    row = dblock[blk]
    base = row[..., 0]
    hi, lo = row[..., 1], row[..., 2]
    # count bits at positions <= bit within the block
    in_hi = bit >= 32
    lo_keep = jnp.where(
        in_hi, jnp.uint32(0xFFFFFFFF),
        jnp.uint32(0xFFFFFFFF) >> (31 - jnp.minimum(bit, 31)))
    hi_keep = jnp.where(
        in_hi, jnp.uint32(0xFFFFFFFF) >> (63 - jnp.maximum(bit, 32)),
        jnp.uint32(0))
    return base + _popcount32(lo & lo_keep).astype(jnp.uint32) \
        + _popcount32(hi & hi_keep).astype(jnp.uint32)


def fetch_genome_window(genome_tiles, start, width: int):
    """Gather genome codes [start, start+width) per lane via tile row
    gathers + log-shift alignment. start: i32[N] (may be negative or
    out of range — such lanes return SEP-ish garbage the caller masks).
    Returns u8[N, width]."""
    ntiles = genome_tiles.shape[0]
    n_rows = width // GBLK + 2
    t0 = jnp.clip(start // GBLK, 0, ntiles - 1)
    rows = []
    for r in range(n_rows):
        rows.append(genome_tiles[jnp.clip(t0 + r, 0, ntiles - 1)])
    buf = jnp.concatenate(rows, axis=1)          # (N, n_rows*GBLK)
    off = (start - t0 * GBLK).astype(jnp.int32)  # 0..GBLK-1 (or clamp spill)
    off = jnp.clip(off, 0, GBLK)
    # log-shift: roll left by off using static shifts
    shift = off
    for b in (32, 16, 8, 4, 2, 1):
        rolled = jnp.roll(buf, -b, axis=1)
        buf = jnp.where((shift & b)[:, None] != 0, rolled, buf)
    return buf[:, :width]


def anchored_count_kernel(reads, rows, genome_tiles, dblock, diff, spill_mask,
                          *, k: int, read_len: int, n_buckets: int,
                          anchor_offsets: tuple | None = None,
                          max_runs: int = 4, max_dirty: int = 8,
                          max_dirty_runs: int = 0, dirty_run_width: int = 0,
                          neighbor_mode: bool = False,
                          dict_axis: str | None = None,
                          block_buckets: int = 0):
    """Process one batch of fixed-length reads.

    reads: u8[R, read_len] code rows (SEP-padded). diff: u32[n_kmers+2]
    difference-array accumulator (depth = cumsum(diff)[:n] at the end,
    computed in finalize together with the dirty/spill contributions).
    Returns (diff, spill_mask) — spill_mask marks reads that must be
    recounted by the exact per-k-mer path (their contributions are NOT
    in diff).

    dict_axis: when set (inside shard_map), `rows` is this device's
    contiguous bucket block of block_buckets buckets and the packed
    rows array no longer needs to fit one HBM (the >HBM escape for the
    ~69 GB GRCh38-scale table). Anchor probes combine across the axis
    with one psum; dirty/tier-2 probes scatter only local finds into
    this device's diff partial (an entry lives on exactly one device);
    the clean-run range-adds (driven by the replicated dblock) are
    gated to the axis's first device. Tiles and dblock stay replicated
    (~4 GB at GRCh38).
    """
    R, L = reads.shape
    W = L - k + 1
    if anchor_offsets is None:
        # derived from the actual row width, not a 150 bp constant
        # (VERDICT r4 Weak #6): evenly spread probes incl. both ends
        anchor_offsets = tuple(sorted({0, W // 3, (2 * W) // 3, W - 1}))
    n_diff = diff.shape[0]
    trash = n_diff - 1

    if dict_axis is not None:
        from quickmer2_tpu.ops.packed_table import probe_packed_block
        blk_lo = (jax.lax.axis_index(dict_axis).astype(jnp.uint32)
                  * jnp.uint32(block_buckets))
        first_in_axis = jax.lax.axis_index(dict_axis) == 0

        def probe_local(qhi, qlo, miss_rank):
            return probe_packed_block(rows, qhi, qlo, n_buckets,
                                      block_buckets, blk_lo, miss_rank)
    else:
        first_in_axis = True

        def probe_local(qhi, qlo, miss_rank):
            return probe_packed(rows, qhi, qlo, n_buckets, miss_rank)

    # --- per-read k-mer codes ---------------------------------------
    flat = reads.reshape(-1)
    # compute sliding k-mers per read row: operate on the flat stream,
    # then mask windows crossing row boundaries via per-row validity
    chi_f, clo_f, valid_f = codec.sliding_kmers(flat, k)
    nwin_flat = chi_f.shape[0]
    pad = R * L - nwin_flat
    chi = jnp.pad(chi_f, (0, pad)).reshape(R, L)[:, :W]
    clo = jnp.pad(clo_f, (0, pad)).reshape(R, L)[:, :W]
    valid = jnp.pad(valid_f, (0, pad)).reshape(R, L)[:, :W]

    # --- anchoring ----------------------------------------------------
    # probe all offsets locally, then (sharded) ONE psum combines the
    # per-device results before the take-first priority scan
    fs, ps = [], []
    for j in anchor_offsets:
        f, _, p = probe_local(chi[:, j], clo[:, j], jnp.uint32(0))
        fs.append(f)
        ps.append(jnp.where(f, p, jnp.uint32(0)))
    fstk = jnp.stack(fs)
    pstk = jnp.stack(ps)
    if dict_axis is not None:
        fstk = jax.lax.psum(fstk.astype(jnp.uint32), dict_axis) > 0
        pstk = jax.lax.psum(pstk, dict_axis)
    # majority-vote anchor selection: each found anchor implies an
    # alignment — fwd start pos-(k-1)-j, rc end pos+j — and anchors
    # from the SAME origin locus agree on it, while an anchor landing
    # in the wrong copy of a repeat does not. Score every anchor by
    # how many anchors agree with its implied alignment (either
    # strand hypothesis) and take the best (ties → earliest). Reads
    # whose first-found anchor sat in a repeat copy previously
    # mis-aligned, mass-mismatched, and spilled to the exact path
    # (~4% structural spill at 0.1%/bp in BENCH_r05); agreement
    # costs 2*A^2 compares per read and no extra fetches.
    A = len(anchor_offsets)
    offs_arr = jnp.asarray(anchor_offsets, jnp.int32)
    av = jnp.stack([fstk[i] & valid[:, j]
                    for i, j in enumerate(anchor_offsets)])   # (A, R)
    p_i32 = pstk.astype(jnp.int32)
    s_cand = p_i32 - (k - 1) - offs_arr[:, None]              # fwd start
    g_cand = p_i32 + offs_arr[:, None]                        # rc end
    agree_f = jnp.zeros((A, R), jnp.int32)
    agree_r = jnp.zeros((A, R), jnp.int32)
    for i in range(A):
        for j2 in range(A):
            okj = av[j2]
            agree_f = agree_f.at[i].add(
                (okj & (s_cand[j2] == s_cand[i])).astype(jnp.int32))
            agree_r = agree_r.at[i].add(
                (okj & (g_cand[j2] == g_cand[i])).astype(jnp.int32))
    score = jnp.where(av, jnp.maximum(agree_f, agree_r), 0)   # (A, R)
    best = jnp.argmax(score, axis=0).astype(jnp.int32)        # first max
    a_found = jnp.any(av, axis=0)
    a_pos = jnp.take_along_axis(p_i32, best[None, :], axis=0)[0]
    a_off = offs_arr[best]

    # --- genome windows, both strands ---------------------------------
    G = genome_tiles.shape[0] * GBLK
    # forward: read t <-> genome[s_f + t], s_f = pos - (k-1) - a_off
    # (tile bytes carry the code in bits 0-2 and neighbor-hit flags in
    # bits 3-6 — mask with & 7 for the code)
    s_f = a_pos - (k - 1) - a_off
    fwd_in_range = (s_f >= 0) & (s_f + L <= G)
    gwraw_f = fetch_genome_window(genome_tiles, s_f, L)
    gwin_f = gwraw_f & jnp.uint8(7)
    match_f = (reads == gwin_f) & (reads < 4) & (gwin_f < 4) \
        & fwd_in_range[:, None]
    # reverse: read aligns to revcomp of genome [ge-L+1, ge], ge = a_pos
    # + a_off (anchor kmer read[a_off+m] = comp(genome[a_pos - m]));
    # read t <-> comp(genome[ge - t])
    ge = a_pos + a_off
    rc_in_range = (ge - (L - 1) >= 0) & (ge < G)
    gwin_r = fetch_genome_window(genome_tiles, ge - (L - 1), L)
    gflip = jnp.flip(gwin_r, axis=1)
    gflip_c = gflip & jnp.uint8(7)
    gwin_rc = jnp.where(gflip_c < 4, (gflip_c - jnp.uint8(2)) & jnp.uint8(3),
                        jnp.uint8(4))
    match_r = (reads == gwin_rc) & (reads < 4) & (gwin_rc < 4) \
        & rc_in_range[:, None]

    use_fwd = jnp.sum(match_f, axis=1) >= jnp.sum(match_r, axis=1)
    match = jnp.where(use_fwd[:, None], match_f, match_r)

    # --- clean k-mer mask ---------------------------------------------
    mm = (~match).astype(jnp.int32)
    cs = jnp.cumsum(mm, axis=1)
    csz = jnp.pad(cs, ((0, 0), (1, 0)))
    clean = (csz[:, k:] - csz[:, :-k]) == 0          # (R, W)
    clean = clean & valid & a_found[:, None]

    # --- clean runs / dirty census ------------------------------------
    prev = jnp.pad(clean[:, :-1], ((0, 0), (1, 0)))
    nxt = jnp.pad(clean[:, 1:], ((0, 0), (0, 1)))
    run_start = clean & ~prev
    run_end = clean & ~nxt
    n_runs = jnp.sum(run_start, axis=1)
    dirty = valid & ~clean
    n_dirty = jnp.sum(dirty, axis=1)

    # spill decided BEFORE any accumulation so spilled reads contribute
    # nothing here (the caller reruns them on the exact per-k-mer path)
    jidx0 = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    if dirty_run_width > 0:
        # run-sliced dirty handling: extract up to max_dirty_runs
        # contiguous dirty runs; a read is covered iff every run fits in
        # dirty_run_width windows
        dprev = jnp.pad(dirty[:, :-1], ((0, 0), (1, 0)))
        dnxt = jnp.pad(dirty[:, 1:], ((0, 0), (0, 1)))
        d_start_m = dirty & ~dprev
        d_end_m = dirty & ~dnxt
        n_dirty_runs = jnp.sum(d_start_m, axis=1)
        d_starts = jnp.full((R, max_dirty_runs), -1, jnp.int32)
        d_ends = jnp.full((R, max_dirty_runs), -1, jnp.int32)
        sm, em = d_start_m, d_end_m
        for m in range(max_dirty_runs):
            s = jnp.min(jnp.where(sm, jidx0, W), axis=1)
            e = jnp.min(jnp.where(em & (jidx0 >= s[:, None]), jidx0, W), axis=1)
            got = s < W
            d_starts = d_starts.at[:, m].set(jnp.where(got, s, -1))
            d_ends = d_ends.at[:, m].set(jnp.where(got, e, -1))
            sm = sm & (jidx0 > s[:, None])
            em = em & (jidx0 > e[:, None])
        widths_ok = jnp.all(
            jnp.where(d_starts >= 0, d_ends - d_starts < dirty_run_width, True),
            axis=1)
        covered = (n_dirty_runs <= max_dirty_runs) & widths_ok
        unanch = ~a_found & jnp.any(valid, axis=1)
        spilled = unanch | (n_runs > max_runs) | ~covered
    elif neighbor_mode and max_dirty == 0:
        # Neighbor-bit fast discard: a read whose mismatches are all
        # (a) genuine base-vs-base substitutions, (b) pairwise >= k
        # apart (every dirty window contains exactly one), and (c) have
        # a zero neighbor-hit flag for the substituted base, provably
        # contributes NOTHING through its dirty windows — each dirty
        # window k-mer is a single-substitution variant covered by the
        # bitmap, which says no variant is in the dictionary. Such
        # reads are fully handled by the clean-run range-adds below;
        # everything else spills. Entirely elementwise: the flags ride
        # in the genome bytes already fetched for the match.
        anyvalid = jnp.any(valid, axis=1)
        in_range = jnp.where(use_fwd, fwd_in_range, rc_in_range)
        g_raw = jnp.where(use_fwd[:, None], gwraw_f, gflip)
        g_code = g_raw & jnp.uint8(7)
        g_nb = (g_raw >> 3) & jnp.uint8(15)
        # substituted base on the GENOME strand: read base (fwd) or its
        # complement (rc alignment)
        b_gen = jnp.where(use_fwd[:, None], reads & jnp.uint8(3),
                          (reads + jnp.uint8(2)) & jnp.uint8(3))
        # read positions covered by at least one valid window
        t_np = np.arange(L)
        hi_c = np.minimum(t_np + 1, W)
        lo_c = np.clip(t_np - k + 1, 0, W)
        csv = jnp.pad(jnp.cumsum(valid.astype(jnp.int32), axis=1),
                      ((0, 0), (1, 0)))
        cov = (csv[:, hi_c] - csv[:, lo_c]) > 0
        mm_any = (~match) & cov
        base_ok = (reads < 4) & (g_code < 4)
        mm_sub = mm_any & base_ok
        mm_bad = jnp.any(mm_any & ~base_ok, axis=1)
        csm = jnp.pad(jnp.cumsum(mm_sub.astype(jnp.int32), axis=1),
                      ((0, 0), (1, 0)))
        mm_close = jnp.any((csm[:, hi_c] - csm[:, lo_c]) >= 2, axis=1)
        nb_hit = jnp.any(
            mm_sub & (((g_nb >> b_gen) & jnp.uint8(1)) != 0), axis=1)
        unanch = anyvalid & (~a_found | ~in_range)
        spilled = unanch | (n_runs > max_runs) | mm_bad | mm_close | nb_hit
    else:
        unanch = ~a_found & jnp.any(valid, axis=1)
        spilled = unanch | (n_runs > max_runs) | (n_dirty > max_dirty)
    active = ~spilled

    # --- clean runs → range-adds --------------------------------------
    jidx = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    start_m = run_start & active[:, None]
    end_m = run_end & active[:, None]
    starts = jnp.full((R, max_runs), -1, jnp.int32)
    ends = jnp.full((R, max_runs), -1, jnp.int32)
    for m in range(max_runs):
        s = jnp.min(jnp.where(start_m, jidx, W), axis=1)       # first start
        e = jnp.min(jnp.where(end_m & (jidx >= s[:, None]), jidx, W), axis=1)
        got = s < W
        starts = starts.at[:, m].set(jnp.where(got, s, -1))
        ends = ends.at[:, m].set(jnp.where(got, e, -1))
        start_m = start_m & (jidx > s[:, None])
        end_m = end_m & (jidx > e[:, None])

    # genome end positions of run boundaries:
    # fwd: k-mer j ends at s_f + j + k - 1
    # rc:  k-mer j ends at ge - j (descending), so a run [j0, j1] covers
    #      genome ends [ge - j1, ge - j0]
    q_start = jnp.where(use_fwd[:, None],
                        s_f[:, None] + starts + (k - 1),
                        ge[:, None] - ends)
    q_end = jnp.where(use_fwd[:, None],
                      s_f[:, None] + ends + (k - 1),
                      ge[:, None] - starts)
    run_ok = starts >= 0
    if dict_axis is not None:
        # the range-adds derive from the REPLICATED dblock: only the
        # axis's first device contributes them, once
        run_ok = run_ok & first_in_axis
    lo_r = rank_at(dblock, jnp.clip(q_start - 1, 0, G - 1))
    lo_r = jnp.where(q_start <= 0, jnp.uint32(0), lo_r)
    hi_r = rank_at(dblock, jnp.clip(q_end, 0, G - 1))
    lo_i = jnp.where(run_ok, lo_r.astype(jnp.int32), trash)
    hi_i = jnp.where(run_ok, hi_r.astype(jnp.int32), trash)
    diff = diff.at[lo_i.reshape(-1)].add(1, mode="promise_in_bounds")
    diff = diff.at[hi_i.reshape(-1)].add(
        jnp.uint32(0) - 1, mode="promise_in_bounds")

    # --- dirty k-mers → exact probes ----------------------------------
    if dirty_run_width > 0:
        # run-sliced: align each dirty run's windows to lane 0 via
        # log-shift rolls (elementwise), probe a dense (R, DW) slab
        P = 1
        while P < W:
            P <<= 1
        chi_p = jnp.pad(chi, ((0, 0), (0, P - W)))
        clo_p = jnp.pad(clo, ((0, 0), (0, P - W)))
        off_l = jax.lax.broadcasted_iota(jnp.int32, (R, dirty_run_width), 1)
        for m in range(max_dirty_runs):
            s = d_starts[:, m]
            exists = (s >= 0) & active
            sc = jnp.maximum(s, 0)
            ahi, alo = chi_p, clo_p
            b = P >> 1
            while b:
                take = (sc & b) != 0
                ahi = jnp.where(take[:, None], jnp.roll(ahi, -b, axis=1), ahi)
                alo = jnp.where(take[:, None], jnp.roll(alo, -b, axis=1), alo)
                b >>= 1
            ahi = ahi[:, :dirty_run_width]
            alo = alo[:, :dirty_run_width]
            lane_ok = exists[:, None] & (off_l <= (d_ends[:, m] - sc)[:, None])
            # local finds only under dict sharding: the entry lives on
            # exactly one device; partials merge by sum at finalize
            f, r, _ = probe_local(ahi.reshape(-1), alo.reshape(-1),
                                  jnp.uint32(trash))
            point = jnp.where(lane_ok.reshape(-1) & f,
                              r.astype(jnp.int32), trash)
            diff = diff.at[point].add(1, mode="promise_in_bounds")
            diff = diff.at[jnp.minimum(point + 1, trash)].add(
                jnp.uint32(0) - 1, mode="promise_in_bounds")
    else:
        dm = dirty & active[:, None]
        d_rank = jnp.full((R, max_dirty), trash, jnp.int32)
        for m in range(max_dirty):
            j = jnp.min(jnp.where(dm, jidx, W), axis=1)
            got = j < W
            jc = jnp.minimum(j, W - 1)
            dhi = jnp.take_along_axis(chi, jc[:, None], axis=1)[:, 0]
            dlo = jnp.take_along_axis(clo, jc[:, None], axis=1)[:, 0]
            f, r, _ = probe_local(dhi, dlo, jnp.uint32(trash))
            d_rank = d_rank.at[:, m].set(
                jnp.where(got & f, r.astype(jnp.int32), trash))
            dm = dm & (jidx > j[:, None])
        # dirty contributions as width-1 range adds: diff[r]+=1, diff[r+1]-=1
        dr = d_rank.reshape(-1)
        point = jnp.minimum(dr, trash)
        diff = diff.at[point].add(1, mode="promise_in_bounds")
        diff = diff.at[jnp.minimum(point + 1, trash)].add(
            jnp.uint32(0) - 1, mode="promise_in_bounds")

    # spill CODE: 0 counted here; 1 spilled, may anchor (tier-2 can
    # rescue); 2 spilled AND unanchorable — the spill population is
    # dominated by repeat-interior reads with no dictionary content
    # (measured ~3.6% of 4.0% at 0.1%/bp), and re-running the anchored
    # kernel on them in tier 2 cannot succeed, so the caller routes
    # code-2 reads straight to the exact path (one fewer device pass
    # and one fewer re-upload for ~90% of spills)
    sp_code = jnp.where(spilled,
                        jnp.where(unanch, jnp.int8(2), jnp.int8(1)),
                        jnp.int8(0))
    return diff, sp_code


anchored_count_batch = jax.jit(
    anchored_count_kernel,
    static_argnames=("k", "read_len", "n_buckets", "anchor_offsets",
                     "max_runs", "max_dirty", "max_dirty_runs",
                     "dirty_run_width", "neighbor_mode", "dict_axis",
                     "block_buckets"))


def _anchored_count_kernel_packed(packed, aux, rows, genome_tiles,
                                  dblock, diff, spill_mask, *, fmt: str,
                                  read_len: int, **kw):
    """anchored_count_kernel on 2-bit packed rows (ops.rowpack): the
    unpack inlines into the same jit, so ~0.26-0.38 bytes/base cross
    the host↔device link instead of 1. fmt: "lens" (suffix-padded
    rows, u16 aux) or "mask" (invalid bitmask aux)."""
    from quickmer2_tpu.ops import rowpack
    reads = rowpack.unpack_batch(fmt, packed, aux, read_len=read_len)
    return anchored_count_kernel(reads, rows, genome_tiles, dblock, diff,
                                 spill_mask, read_len=read_len, **kw)


anchored_count_batch_packed = jax.jit(
    _anchored_count_kernel_packed,
    static_argnames=("fmt", "k", "read_len", "n_buckets", "anchor_offsets",
                     "max_runs", "max_dirty", "max_dirty_runs",
                     "dirty_run_width", "neighbor_mode", "dict_axis",
                     "block_buckets"))


@functools.partial(jax.jit, static_argnames=("k", "n_buckets", "dict_axis",
                                             "block_buckets"))
def exact_count_rows(reads, mask, rows, depth, *, k: int, n_buckets: int,
                     dict_axis: str | None = None, block_buckets: int = 0):
    """Exact per-k-mer probe over read rows, masked per read — used for
    spilled reads. Accumulates PLAIN counts (one scatter-add per k-mer
    — half the random ops of the diff-array convention); the caller
    adds this accumulator to the cumsum'd diff array at finalize.

    dict_axis: sharded mode — `rows` is this device's bucket block;
    only local finds are scattered (no collectives; partials merge by
    sum at finalize)."""
    R, L = reads.shape
    W = L - k + 1
    trash = depth.shape[0] - 1
    flat = reads.reshape(-1)
    chi_f, clo_f, valid_f = codec.sliding_kmers(flat, k)
    pad = R * L - chi_f.shape[0]
    chi = jnp.pad(chi_f, (0, pad)).reshape(R, L)[:, :W].reshape(-1)
    clo = jnp.pad(clo_f, (0, pad)).reshape(R, L)[:, :W].reshape(-1)
    valid = jnp.pad(valid_f, (0, pad)).reshape(R, L)[:, :W]
    valid = (valid & mask[:, None]).reshape(-1)
    if dict_axis is not None:
        from quickmer2_tpu.ops.packed_table import probe_packed_block
        blk_lo = (jax.lax.axis_index(dict_axis).astype(jnp.uint32)
                  * jnp.uint32(block_buckets))
        f, r, _ = probe_packed_block(rows, chi, clo, n_buckets,
                                     block_buckets, blk_lo,
                                     jnp.uint32(trash))
    else:
        f, r, _ = probe_packed(rows, chi, clo, n_buckets, jnp.uint32(trash))
    point = jnp.where(valid & f, r.astype(jnp.int32), trash)
    return depth.at[point].add(1, mode="promise_in_bounds")


@functools.partial(jax.jit,
                   static_argnames=("fmt", "k", "n_buckets", "read_len"))
def exact_count_rows_packed(packed, aux, rows, depth, *, fmt: str, k: int,
                            n_buckets: int, read_len: int):
    """exact_count_rows on 2-bit packed rows (all rows unmasked)."""
    from quickmer2_tpu.ops import rowpack
    reads = rowpack.unpack_batch(fmt, packed, aux, read_len=read_len)
    mask = jnp.ones(reads.shape[0], bool)
    return exact_count_rows(reads, mask, rows, depth, k=k,
                            n_buckets=n_buckets)


@functools.partial(jax.jit, static_argnames=("k", "n_buckets"))
def exact_count_rows_mono(reads, mono_rows, depth, *, k: int,
                          n_buckets: int):
    """Exact spill recount through the MONO single-gather table
    (ops.monotable; measured 88.5 vs the packed probe's 59.7 M kmers/s
    on v5e — BENCH_r04): one 64B row gather per k-mer, depth in SLOT
    order. Returns (depth, packed unresolved bitmask over the R*W
    window lanes) — unresolved lanes (miss in a full bucket) may
    belong to the side table; the caller recounts them on the host."""
    R, L = reads.shape
    W = L - k + 1
    trash = depth.shape[0] - 1
    flat = reads.reshape(-1)
    chi_f, clo_f, valid_f = codec.sliding_kmers(flat, k)
    pad = R * L - chi_f.shape[0]
    chi = jnp.pad(chi_f, (0, pad)).reshape(R, L)[:, :W].reshape(-1)
    clo = jnp.pad(clo_f, (0, pad)).reshape(R, L)[:, :W].reshape(-1)
    valid = jnp.pad(valid_f, (0, pad)).reshape(R, L)[:, :W].reshape(-1)
    from quickmer2_tpu.ops.monotable import probe_mono
    found, slot, unresolved = probe_mono(mono_rows, chi, clo, n_buckets)
    idx = jnp.where(valid & found, slot, jnp.uint32(trash)).astype(jnp.int32)
    depth = depth.at[idx].add(1, mode="promise_in_bounds")
    return depth, jnp.packbits(valid & unresolved)


@functools.partial(jax.jit,
                   static_argnames=("fmt", "k", "n_buckets", "read_len"))
def exact_count_rows_mono_packed(packed, aux, mono_rows, depth, *,
                                 fmt: str, k: int, n_buckets: int,
                                 read_len: int):
    """exact_count_rows_mono on 2-bit packed rows."""
    from quickmer2_tpu.ops import rowpack
    reads = rowpack.unpack_batch(fmt, packed, aux, read_len=read_len)
    return exact_count_rows_mono(reads, mono_rows, depth, k=k,
                                 n_buckets=n_buckets)


class AnchoredDepthCounter:
    """Feeds fixed-length read rows through the anchored fast path.

    Reads that spill (no anchor, > max_runs clean runs, or > max_dirty
    dirty k-mers — with the default max_dirty=0, ANY mismatching read)
    are compacted host-side into dense batches and recounted by the
    exact per-k-mer path, so the exact path's cost is proportional to
    the spill volume, not the batch width. finish() returns the depth
    vector (u32[n_kmers]) — bit-identical to the per-k-mer DepthCounter
    on the same input.
    """

    def __init__(self, index: AnchoredIndex, k: int, read_len: int,
                 batch_reads: int | None = None, max_runs: int = 4,
                 max_dirty: int = 0, tier2_max_dirty: int = 0,
                 tier2_max_runs: int = 6, tier2_dirty_runs: int = 2,
                 tier2_run_width: int = 32,
                 anchor_offsets: tuple | None = None,
                 neighbor_mode: bool | None = None,
                 spill_lag: int = 16, pack_h2d: bool = True,
                 prefetch_puts: bool = True, put_depth: int = 4,
                 mono_spill: bool = True):
        self.index = index
        self.k = k
        self.read_len = read_len
        # 2-bit pack rows before device_put (ops.rowpack): ~2.7-3.8x
        # less host→device traffic, bit-identical results (the unpack
        # is exact). Off switch kept for A/B measurement.
        self.pack_h2d = pack_h2d
        # prefetch_puts: pack+device_put run on a dedicated transfer
        # thread one batch ahead, so the (possibly slow) host→device
        # link overlaps parsing and device dispatch. Dispatch order is
        # decided by the main thread, so results stay deterministic.
        self._xfer = None
        if pack_h2d and prefetch_puts:
            import concurrent.futures
            self._xfer = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="qm2-h2d")
        # put_depth: how many packed batches may sit in the transfer
        # queue before kernel dispatch is forced. Deeper queues smooth
        # a high-latency host↔device link (measured: on a ~30-100 ms
        # round-trip tunnel, 16k batches with put_depth 8 + spill_lag 32
        # run ~1.6x faster end-to-end than 128k/depth-1/lag-3).
        self._put_q = collections.deque()
        self._put_depth = put_depth
        # default batch sizes by LANES, not rows: at 1024-wide HiFi
        # segment rows a 2^15-row batch is 33.5M lanes and the exact
        # recount's sliding-codec temporaries (7+ u32 arrays) OOM'd a
        # 16 GB chip (round-5 HiFi rehearsal); 2^22 lanes ≈ the shape
        # the e2e bench tuned at 150 bp
        if batch_reads is None:
            batch_reads = max(1 << 12, (1 << 22) // read_len)
        self.batch_reads = batch_reads
        self.max_runs = max_runs
        self.max_dirty = max_dirty
        # neighbor-bit fast discard (see anchored_count_kernel): on by
        # default whenever the index carries the bitmap
        self.neighbor_mode = (index.has_neighbor_bits if neighbor_mode is None
                              else neighbor_mode)
        if self.neighbor_mode and not index.has_neighbor_bits:
            raise ValueError("neighbor_mode requires an index built with "
                             "neighbor_bits=True")
        # tier 2: spilled reads re-run the anchored kernel in RUN-SLICED
        # dirty mode — clean fragments still count via range-adds and
        # each dirty run (<= tier2_run_width windows around an error) is
        # probed as one dense aligned slab; only reads exceeding those
        # caps (multi-error clusters, unanchorable) pay the exact path.
        # (The per-k-mer max_dirty budget variant measured no cheaper
        # than exact on v5e and is off by default.)
        self.tier2_max_dirty = tier2_max_dirty
        self.tier2_max_runs = tier2_max_runs
        self.tier2_dirty_runs = tier2_dirty_runs
        self.tier2_run_width = tier2_run_width
        W = read_len - k + 1
        if anchor_offsets is None:
            anchor_offsets = tuple(
                sorted({0, W // 3, (2 * W) // 3, W - 1} - {-1}))
        self.anchor_offsets = tuple(int(a) for a in anchor_offsets if 0 <= a < W)
        self.diff = jnp.zeros(index.n_kmers + 2, dtype=jnp.uint32)
        # plain-count accumulator for the exact path (single scatter per
        # k-mer instead of the diff convention's two)
        self.exact_acc = jnp.zeros(index.n_kmers + 2, dtype=jnp.uint32)
        # mono_spill: spilled reads recount through the single-gather
        # MONO table (measured 1.48x the packed probe — BENCH_r04) at
        # the cost of +16B/kmer HBM for its rows; unresolved lanes
        # (~1%) recount on the host against the side table. The sharded
        # counter overrides the exact step and forces this off.
        self.mono_spill = mono_spill
        self._mono = None
        if mono_spill:
            # built once per index and cached on it (cohort batching
            # constructs one counter per sample against a shared index)
            mt = getattr(index, "_mono_cache", None)
            if mt is None:
                from quickmer2_tpu.ops.monotable import MonoTable
                hrows = (index.host_rows if index.host_rows is not None
                         else np.asarray(index.rows))
                flat = np.asarray(hrows).reshape(-1, 4)
                live = (flat[:, 0] | flat[:, 1]) != 0
                mt = MonoTable.build(flat[live, 0], flat[live, 1],
                                     rank=flat[live, 2])
                assert mt.n_kmers == index.n_kmers
                mt.device_rows_cached = jnp.asarray(mt.rows)
                index._mono_cache = mt
            self._mono = mt
            self._mono_rows = mt.device_rows_cached
            self.exact_slot = jnp.zeros(mt.n_slots + 1, jnp.uint32)
            self._side_counts = np.zeros(index.n_kmers, np.uint64)
        self._pending: list[np.ndarray] = []
        self._pending_rows = 0
        self._spill: list[np.ndarray] = []
        self._spill_rows = 0
        self._spill2: list[np.ndarray] = []
        self._spill2_rows = 0
        # spill masks are fetched LAGGED (up to spill_lag batches deep)
        # so the per-batch device→host sync (tens of ms on a
        # remote-tunnel backend) overlaps the next batches' device work
        # instead of serializing with it. Consequence: n_spilled /
        # n_spilled2 lag the fed batches and are only FINAL after
        # finish(); snapshot() drains the queue first so checkpoints
        # never observe stale counters.
        self._inflight = collections.deque()
        self._lag = spill_lag
        self.n_reads = 0
        self.n_spilled = 0
        self.n_spilled2 = 0
        # per-phase wall accounting (VERDICT r4 Next #4: "explain the
        # HiFi 164 s"): pack = host 2-bit packing + device_put (on the
        # transfer thread when prefetching), dispatch = jit call walls
        # per kind (the FIRST dispatch of a kind carries its compile,
        # recorded separately as compile_*), drain = spill-mask /
        # side-table D2H materialization, finish_sync = the final
        # accumulator fetches.
        self.phase_s: dict = collections.defaultdict(float)
        self._seen_kinds: set = set()

    def feed_reads(self, reads_rows: np.ndarray) -> None:
        """reads_rows: u8[R, read_len] code rows (SEP-padded)."""
        assert reads_rows.shape[1] == self.read_len
        # counted here, not in _run: batch-shape padding rows (all-SEP,
        # can never anchor or spill) are not reads
        self.n_reads += len(reads_rows)
        self._pending.append(reads_rows)
        self._pending_rows += len(reads_rows)
        while self._pending_rows >= self.batch_reads:
            buf = np.concatenate(self._pending)
            self._pending = [buf[self.batch_reads:]]
            self._pending_rows = len(self._pending[0])
            self._run(buf[: self.batch_reads])

    # -- device-step hooks (overridden by the sharded counter) ---------

    def _tier_kw(self, tier: int) -> dict:
        if tier == 1:
            return dict(k=self.k, read_len=self.read_len,
                        n_buckets=self.index.n_buckets,
                        anchor_offsets=self.anchor_offsets,
                        max_runs=self.max_runs, max_dirty=self.max_dirty,
                        neighbor_mode=self.neighbor_mode)
        return dict(k=self.k, read_len=self.read_len,
                    n_buckets=self.index.n_buckets,
                    anchor_offsets=self.anchor_offsets,
                    max_runs=self.tier2_max_runs,
                    max_dirty=self.tier2_max_dirty,
                    max_dirty_runs=self.tier2_dirty_runs,
                    dirty_run_width=self.tier2_run_width)

    def _pack_put(self, batch: np.ndarray):
        """Pack a host batch and move it to device (runs on the
        transfer thread when prefetching)."""
        import time as _time
        t0 = _time.time()
        from quickmer2_tpu.ops import rowpack
        fmt, pk, aux = rowpack.pack_batch(batch)
        out = fmt, jnp.asarray(pk), jnp.asarray(aux)
        self.phase_s["pack_put"] += _time.time() - t0
        return out

    def _kernel_step(self, batch: np.ndarray, tier: int, put=None):
        """Run one anchored batch on device, accumulate into self.diff,
        return the spill mask (device array or ndarray; materialized
        lazily by _drain_one)."""
        ix = self.index
        if put is not None:
            fmt, pk, aux = put
            self.diff, spilled = anchored_count_batch_packed(
                pk, aux, ix.rows, ix.genome_tiles, ix.dblock, self.diff,
                None, fmt=fmt, **self._tier_kw(tier))
        else:
            self.diff, spilled = anchored_count_batch(
                jnp.asarray(batch), ix.rows, ix.genome_tiles, ix.dblock,
                self.diff, None, **self._tier_kw(tier))
        return spilled

    def _exact_step(self, batch: np.ndarray, put=None) -> None:
        ix = self.index
        if self.mono_spill:
            if put is not None:
                fmt, pk, aux = put
                self.exact_slot, ub = exact_count_rows_mono_packed(
                    pk, aux, self._mono_rows, self.exact_slot, fmt=fmt,
                    k=self.k, n_buckets=self._mono.n_buckets,
                    read_len=self.read_len)
            else:
                self.exact_slot, ub = exact_count_rows_mono(
                    jnp.asarray(batch), self._mono_rows, self.exact_slot,
                    k=self.k, n_buckets=self._mono.n_buckets)
            # side-table recount rides the same lagged drain queue as
            # the spill masks
            try:
                ub.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
            self._inflight.append((batch, ub, "exactmask"))
            if len(self._inflight) > self._lag:
                self._drain_all()
            return
        if put is not None:
            fmt, pk, aux = put
            self.exact_acc = exact_count_rows_packed(
                pk, aux, ix.rows, self.exact_acc, fmt=fmt,
                k=self.k, n_buckets=ix.n_buckets, read_len=self.read_len)
        else:
            self.exact_acc = exact_count_rows(
                jnp.asarray(batch), jnp.ones(len(batch), bool), ix.rows,
                self.exact_acc, k=self.k, n_buckets=ix.n_buckets)

    def _drain_exact_mask(self, batch: np.ndarray, ub) -> None:
        """Recount this exact batch's unresolved window lanes against
        the mono side table (host; O(lanes))."""
        W = self.read_len - self.k + 1
        mask = np.unpackbits(np.asarray(ub))
        lanes = np.flatnonzero(mask[: len(batch) * W])
        if len(lanes) == 0:
            return
        rows_i = lanes // W
        cols = lanes % W
        m = len(lanes)
        strip = np.full((m, self.k + 1), codec.SEP, np.uint8)
        idx = cols[:, None] + np.arange(self.k)[None, :]
        strip[:, : self.k] = batch[rows_i[:, None], idx]
        canon, _ = codec.sliding_kmers_np(strip.reshape(-1), self.k)
        km = canon[:: self.k + 1][:m]
        hi = (km >> np.uint64(32)).astype(np.uint32)
        lo = km.astype(np.uint32)
        found, rank = self._mono.side_lookup_np(hi, lo)
        if found.any():
            np.add.at(self._side_counts, rank[found], 1)

    # -- transfer queue: pack+put one batch ahead of dispatch ----------

    def _enqueue(self, kind, batch: np.ndarray) -> None:
        """kind: tier 1, tier 2, or "exact". Pack+put is submitted to
        the transfer thread (or done inline); kernel dispatch happens
        on the main thread in FIFO order, one batch behind the puts."""
        if not self.pack_h2d:
            payload = None
        elif self._xfer is not None:
            payload = self._xfer.submit(self._pack_put, batch)
        else:
            payload = self._pack_put(batch)
        self._put_q.append((kind, batch, payload))
        while len(self._put_q) > self._put_depth:
            self._dispatch_oldest()

    def _dispatch_oldest(self) -> None:
        import time as _time
        kind, batch, payload = self._put_q.popleft()
        t0 = _time.time()
        put = payload.result() if hasattr(payload, "result") else payload
        t1 = _time.time()
        self.phase_s["put_wait"] += t1 - t0
        if kind == "exact":
            self._exact_step(batch, put=put)
            el = _time.time() - t1
        else:
            mask = self._kernel_step(batch, kind, put=put)
            el = _time.time() - t1
        self.phase_s[f"dispatch_{kind}"] += el
        if kind not in self._seen_kinds:
            # the first dispatch of a kind blocks on its jit compile
            self._seen_kinds.add(kind)
            self.phase_s[f"compile_{kind}"] = el
        if kind == "exact":
            return
        try:
            # start the device→host copy of the spill mask now so the
            # lagged np.asarray in _drain_one finds it ready instead of
            # paying a blocking round trip per batch
            mask.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        self._inflight.append((batch, mask, kind))
        if len(self._inflight) > self._lag:
            self._drain_all()

    def _merged_accumulators(self) -> tuple[np.ndarray, np.ndarray]:
        diff = np.asarray(jax.device_get(self.diff)).astype(np.uint32)
        acc = np.asarray(jax.device_get(self.exact_acc)).astype(np.uint32)
        return diff, acc

    # -------------------------------------------------------------------

    def _run(self, batch: np.ndarray) -> None:
        self._enqueue(1, batch)

    def _run_tier2(self, batch: np.ndarray) -> None:
        if self.tier2_run_width == 0 and self.tier2_max_dirty == 0:
            self._run_exact(batch)
            return
        self._enqueue(2, batch)

    def _drain_all(self) -> None:
        """Materialize EVERY in-flight spill mask in ONE device→host
        transfer per mask kind and route the spilled reads in order.
        One fetch per lag-full of batches instead of one round trip per
        batch: the bench's replay breakdown showed per-batch mask
        fetches cost a full link round trip each (~46 ms on the tunnel
        harness — 62% of the replay wall, BENCH_r05)."""
        import time as _time
        if not self._inflight:
            return
        t0 = _time.time()
        items = list(self._inflight)
        self._inflight.clear()
        tier_masks = [m for _, m, t in items if t != "exactmask"]
        exact_masks = [m for _, m, t in items if t == "exactmask"]
        if tier_masks:
            flat = np.asarray(jax.device_get(
                jnp.concatenate([m.reshape(-1) for m in tier_masks])))
        if exact_masks:
            eflat = np.asarray(jax.device_get(
                jnp.concatenate([m.reshape(-1) for m in exact_masks])))
        self.phase_s["drain"] += _time.time() - t0
        toff = eoff = 0
        for batch, mask, tier in items:
            if tier == "exactmask":
                n = mask.shape[0]
                self._drain_exact_mask(batch, eflat[eoff:eoff + n])
                eoff += n
            else:
                n = int(np.prod(mask.shape))
                self._route_spill(batch, flat[toff:toff + n], tier)
                toff += n

    def _route_spill(self, batch: np.ndarray, sp: np.ndarray, tier) -> None:
        """Route one batch's materialized spill codes: tier1 code 1 →
        the tier-2 queue, tier1 code 2 (unanchorable) and any tier2
        spill → the exact queue. Queues flush into _run_tier2/_run_exact
        when a full dense batch accumulates."""
        sp = np.asarray(sp).reshape(-1)
        n_sp = int((sp != 0).sum())
        if not n_sp:
            return
        if tier == 1:
            self.n_spilled += n_sp
            t2 = sp == 1
            ex = sp == 2
            if t2.any():
                self._spill.append(batch[t2])
                self._spill_rows += int(t2.sum())
                while self._spill_rows >= self.batch_reads:
                    buf = np.concatenate(self._spill)
                    self._spill = [buf[self.batch_reads:]]
                    self._spill_rows = len(self._spill[0])
                    self._run_tier2(buf[: self.batch_reads])
            if ex.any():
                self._enqueue_exact_rows(batch[ex])
        else:
            self._enqueue_exact_rows(batch[sp != 0])

    def _enqueue_exact_rows(self, rows: np.ndarray) -> None:
        self.n_spilled2 += len(rows)
        self._spill2.append(rows)
        self._spill2_rows += len(rows)
        while self._spill2_rows >= self.batch_reads:
            buf = np.concatenate(self._spill2)
            self._spill2 = [buf[self.batch_reads:]]
            self._spill2_rows = len(self._spill2[0])
            self._run_exact(buf[: self.batch_reads])

    def _run_exact(self, batch: np.ndarray) -> None:
        self._enqueue("exact", batch)

    def _flush_padded(self, parts: list[np.ndarray], runner) -> None:
        buf = np.concatenate(parts)
        pad_rows = (-len(buf)) % self.batch_reads
        if pad_rows:
            buf = np.concatenate(
                [buf, np.full((pad_rows, self.read_len), codec.SEP, np.uint8)])
        for off in range(0, len(buf), self.batch_reads):
            runner(buf[off: off + self.batch_reads])

    def finish(self) -> np.ndarray:
        if self._pending_rows:
            self._flush_padded(self._pending, self._run)
            self._pending, self._pending_rows = [], 0
        # drain queued puts + lagged spill masks; routing tier-1 spills
        # enqueues tier-2 work (and so on), so loop until settled
        while (self._put_q or self._inflight or self._spill_rows
               or self._spill2_rows):
            while self._put_q:
                self._dispatch_oldest()
            self._drain_all()
            if self._spill_rows:
                parts, self._spill, self._spill_rows = self._spill, [], 0
                self._flush_padded(parts, self._run_tier2)
            elif self._spill2_rows:
                parts, self._spill2, self._spill2_rows = self._spill2, [], 0
                self._flush_padded(parts, self._run_exact)
        if self._xfer is not None:
            self._xfer.shutdown(wait=True)
            self._xfer = None   # later feeds fall back to inline puts
        import time as _time
        t0 = _time.time()
        diff, acc = self._merged_accumulators()
        self.phase_s["finish_sync"] += _time.time() - t0
        depth = np.cumsum(diff, dtype=np.uint32)[: self.index.n_kmers]
        depth += acc[: self.index.n_kmers]
        if self.mono_spill:
            slots = np.asarray(jax.device_get(self.exact_slot))[:-1]
            live = self._mono.slot_rank < self.index.n_kmers
            depth[self._mono.slot_rank[live]] += slots[live]  # ranks unique
            depth += self._side_counts.astype(np.uint32)   # u32 wrap (Q8)
        return depth

    # -- checkpoint/resume ----------------------------------------------

    def _put_accumulators(self, diff: np.ndarray, acc: np.ndarray) -> None:
        """Load host accumulator snapshots back onto device (overridden
        by the sharded counter to re-apply the mesh sharding)."""
        self.diff = jnp.asarray(diff)
        self.exact_acc = jnp.asarray(acc)

    def _cat_rows(self, parts: list[np.ndarray]) -> np.ndarray:
        if not parts:
            return np.zeros((0, self.read_len), np.uint8)
        return np.concatenate(parts)

    def snapshot(self) -> tuple[dict, dict]:
        """Settle all in-flight device work, then capture the full
        counter state as (arrays, meta). With the byte offset and parser
        state held by the caller this determines the remaining
        computation exactly; restore() + the same remaining stream
        reproduces finish() bit-for-bit. Draining the put queue and
        _inflight first means the spill counters in meta are exact,
        never lagged."""
        while self._put_q:
            self._dispatch_oldest()
        self._drain_all()
        arrays = {"diff": np.asarray(jax.device_get(self.diff)),
                  "exact_acc": np.asarray(jax.device_get(self.exact_acc)),
                  "pending": self._cat_rows(self._pending),
                  "spill": self._cat_rows(self._spill),
                  "spill2": self._cat_rows(self._spill2)}
        meta = {"n_reads": self.n_reads, "n_spilled": self.n_spilled,
                "n_spilled2": self.n_spilled2, "read_len": self.read_len,
                "mono_spill": self.mono_spill}
        if self.mono_spill:
            arrays["exact_slot"] = np.asarray(jax.device_get(self.exact_slot))
            arrays["side_counts"] = self._side_counts.copy()
        return arrays, meta

    def restore(self, arrays: dict, meta: dict) -> None:
        if int(meta["read_len"]) != self.read_len:
            raise ValueError(
                f"checkpoint read_len {meta['read_len']} != counter "
                f"read_len {self.read_len}")
        if bool(meta.get("mono_spill", False)) != self.mono_spill:
            raise ValueError(
                f"checkpoint mono_spill={meta.get('mono_spill')} != this "
                f"counter's {self.mono_spill}; resume with the same setting")
        self._put_accumulators(np.asarray(arrays["diff"], np.uint32),
                               np.asarray(arrays["exact_acc"], np.uint32))
        if self.mono_spill:
            self.exact_slot = jnp.asarray(
                np.asarray(arrays["exact_slot"], np.uint32))
            self._side_counts = np.asarray(arrays["side_counts"],
                                           np.uint64).copy()
        def rows_of(name):
            r = np.asarray(arrays[name], np.uint8).reshape(-1, self.read_len)
            return ([r] if len(r) else []), len(r)
        self._pending, self._pending_rows = rows_of("pending")
        self._spill, self._spill_rows = rows_of("spill")
        self._spill2, self._spill2_rows = rows_of("spill2")
        self._inflight.clear()
        self._put_q.clear()
        self.n_reads = int(meta["n_reads"])
        self.n_spilled = int(meta["n_spilled"])
        self.n_spilled2 = int(meta["n_spilled2"])


def rows_from_flat_codes(codes: np.ndarray, read_len: int,
                         with_overflow: bool = False,
                         segment_k: int | None = None,
                         stats_out: dict | None = None):
    """Split a separator-delimited code stream into fixed-length
    SEP-padded rows (vectorized).

    Reads longer than read_len:
      - segment_k=k (the anchored default): sliced into read_len-wide
        SEGMENTS with stride read_len-k+1 — consecutive segments share
        a k-1-base overlap, so every k-mer window of the read lands in
        EXACTLY one segment (global window w belongs to segment
        w // stride). Each segment is itself a genome substring and
        rides the anchored fast path unchanged; a 17 kb HiFi read
        becomes ~17 clean rows instead of bypassing the flagship
        engine (the reference handles 100 KB lines "with negligible
        impact", README.md:126-130 — this is the TPU equivalent).
      - with_overflow (and no segment_k): returned as a second value,
        a separator-delimited code stream for the flat per-k-mer path.
      - otherwise: raise."""
    codes = np.asarray(codes, np.uint8)
    empty_over = np.zeros(0, np.uint8)
    if len(codes) == 0:
        rows = np.zeros((0, read_len), np.uint8)
        return (rows, empty_over) if with_overflow else rows
    # fast path: uniform-length reads, exactly (read_len+1)-periodic
    # stream (the dominant FASTQ shape) → a reshape, no gather
    L1 = read_len + 1
    if len(codes) % L1 == 0 and len(codes) and codes[read_len] == codec.SEP:
        n = len(codes) // L1
        mat = codes.reshape(n, L1)
        if (mat[:, read_len] == codec.SEP).all() and not \
                (mat[:, :read_len] == codec.SEP).any():
            rows = np.ascontiguousarray(mat[:, :read_len])
            return (rows, empty_over) if with_overflow else rows
    sep_idx = np.flatnonzero(codes == codec.SEP)
    bounds = np.concatenate([[-1], sep_idx, [len(codes)]])
    starts = bounds[:-1] + 1
    lens = bounds[1:] - starts
    keep = lens > 0
    starts, lens = starts[keep], lens[keep]
    overflow = empty_over
    n_segmented = 0
    if len(starts) and lens.max() > read_len:
        over = lens > read_len
        if segment_k is not None:
            stride = read_len - segment_k + 1
            o_starts = starts[over].astype(np.int64)
            o_lens = lens[over].astype(np.int64)
            n_seg = -(-(o_lens - segment_k + 1) // stride)   # >= 2
            rep = np.repeat(np.arange(len(o_starts)), n_seg)
            csum = np.concatenate([[0], np.cumsum(n_seg)])
            j = np.arange(int(n_seg.sum())) - csum[rep]
            seg_starts = o_starts[rep] + j * stride
            seg_lens = np.minimum(read_len,
                                  o_starts[rep] + o_lens[rep] - seg_starts)
            starts = np.concatenate([starts[~over], seg_starts])
            lens = np.concatenate([lens[~over], seg_lens])
            n_segmented = len(o_starts)
            if stats_out is not None:
                stats_out["n_long_reads"] = \
                    stats_out.get("n_long_reads", 0) + n_segmented
                stats_out["n_segments"] = \
                    stats_out.get("n_segments", 0) + int(n_seg.sum())
        elif not with_overflow:
            raise ValueError(
                f"read of {lens.max()} bases exceeds row width {read_len}")
        else:
            over_parts = []
            for s, ln in zip(starts[over], lens[over]):
                over_parts.append(codes[s: s + ln])
                over_parts.append(np.array([codec.SEP], np.uint8))
            overflow = np.concatenate(over_parts)
            starts, lens = starts[~over], lens[~over]
    if len(starts) == 0:
        rows = np.zeros((0, read_len), np.uint8)
        return (rows, overflow) if with_overflow else rows
    codes_pad = np.concatenate([codes, np.full(read_len, codec.SEP, np.uint8)])
    idx = starts.astype(np.int64)[:, None] + np.arange(read_len)[None, :]
    rows = codes_pad[idx]
    short = lens < read_len
    if short.any():
        rows[short] = np.where(
            np.arange(read_len)[None, :] >= lens[short][:, None],
            codec.SEP, rows[short])
    return (rows, overflow) if with_overflow else rows


class RowStreamer:
    """Accumulates a separator-delimited code stream and emits
    fixed-length read rows, carrying partial reads across chunks.

    With segment_k=k (how pipelines.count constructs it), reads longer
    than read_len are sliced into read_len-wide segments with a k-1
    overlap (see rows_from_flat_codes) so long reads ride the anchored
    fast path as ordinary rows; .stats counts them. Without segment_k,
    overlong reads accumulate in .overflow (a separator-delimited code
    stream) for the caller to route to the flat path."""

    def __init__(self, read_len: int, segment_k: int | None = None):
        self.read_len = read_len
        self.segment_k = segment_k
        self._tail = np.zeros(0, np.uint8)
        self.overflow: list[np.ndarray] = []
        self.stats: dict = {}

    def take_overflow(self) -> np.ndarray:
        if not self.overflow:
            return np.zeros(0, np.uint8)
        out = np.concatenate(self.overflow)
        self.overflow = []
        return out

    def feed(self, codes: np.ndarray) -> np.ndarray:
        buf = np.concatenate([self._tail, codes]) if len(self._tail) else codes
        seps = np.flatnonzero(buf == codec.SEP)
        if len(seps) == 0:
            self._tail = buf
            return np.zeros((0, self.read_len), np.uint8)
        cut = seps[-1] + 1
        self._tail = buf[cut:]
        rows, over = rows_from_flat_codes(buf[:cut], self.read_len,
                                          with_overflow=True,
                                          segment_k=self.segment_k,
                                          stats_out=self.stats)
        if len(over):
            self.overflow.append(over)
        return rows

    def finish(self) -> np.ndarray:
        rows, over = rows_from_flat_codes(self._tail, self.read_len,
                                          with_overflow=True,
                                          segment_k=self.segment_k,
                                          stats_out=self.stats)
        if len(over):
            self.overflow.append(over)
        self._tail = np.zeros(0, np.uint8)
        return rows

    # -- checkpoint/resume ----------------------------------------------

    def snapshot(self) -> dict:
        over = (np.concatenate(self.overflow) if self.overflow
                else np.zeros(0, np.uint8))
        return {"tail": self._tail.copy(), "overflow": over}

    def restore(self, snap: dict) -> None:
        self._tail = np.asarray(snap["tail"], np.uint8)
        over = np.asarray(snap["overflow"], np.uint8)
        self.overflow = [over] if len(over) else []
