"""Edit-distance filter as a blocked Hamming join — the search-phase
flagship kernel.

Reference semantics (Recurse_edit, QuicKmer.c:687-736): for each unique
k-mer u, sum the occurrence counts of every substitution neighbor at
Hamming distance 1..e (e ≤ 2), probing neighbors in canonical form.
Enumerating neighbors costs ~3.9k random probes per k-mer at e=2 —
8×10¹² probes for a GRCh38 build — and random access is the one thing
a TPU does slowly (~10 ns/element, ARCHITECTURE.md). This module
inverts the enumeration into a weighted JOIN that runs on the VPU as
dense compares:

  sum(u) = Σ_{w ∈ W, 1 ≤ H(w,u) ≤ e} occ(w)

where W = all distinct genome k-mers ∪ their reverse complements
(palindrome duplicates dropped) — every neighbor WORD of u that can
probe successfully is such a w, exactly once.

Pigeonhole: split the k bases into 3 contiguous parts; any pair with
H ≤ 2 agrees exactly on ≥ 1 part. For each part, group W and the
queries by the part's value into padded bucket blocks and compare every
query against its bucket's members with vectorized XOR + popcount —
dense, batched, random-access-free. A pair with m exact parts is found
by exactly the m part-joins whose bucket is intact, so each join
contributes occ·(6/m) and the total is divided by 6 (m ∈ {1,2,3} all
divide 6; m is computed per pair from the XOR itself).

Exactness under bucket overflow: buckets larger than `cpad` are
truncated, so any query whose OWN part value lands in an overflowed
bucket (for any part) is routed to the slow path
(ops.editdist.neighbor_occr_sum_packed — per-neighbor packed-table
probes); for the remaining fast queries every exact-part join of every
relevant pair is intact, because the pair's bucket in an exact part IS
the query's bucket. Differential tests assert fast+slow == brute force
on repeat-heavy genomes (tests/test_hamming_join.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from quickmer2_tpu.ops import codec


def part_ranges(k: int) -> list[tuple[int, int]]:
    """Three contiguous base ranges covering [0, k) (bit offsets are
    2x). First part takes the remainder."""
    p = k // 3
    first = k - 2 * p
    return [(0, first), (first, first + p), (first + p, k)]


def _extract_part_np(hi: np.ndarray, lo: np.ndarray, lo_base: int,
                     hi_base: int) -> np.ndarray:
    """Bits [2*lo_base, 2*hi_base) of the 2k-bit (hi,lo) code as u32
    (part width ≤ 16 bases = 32 bits; base 16 is the lo/hi word seam)."""
    a, b = 2 * lo_base, 2 * hi_base
    width = b - a
    assert width <= 32
    v = np.zeros(len(hi), np.uint64)
    full = (np.asarray(lo, np.uint64)
            | (np.asarray(hi, np.uint64) << np.uint64(32)))
    v = (full >> np.uint64(a)) & np.uint64((1 << width) - 1)
    return v.astype(np.uint32)


def _part_masks(k: int):
    """(hi_mask, lo_mask) u32 pairs for each of the 3 parts."""
    masks = []
    for (s, e) in part_ranges(k):
        a, b = 2 * s, 2 * e
        m = ((1 << b) - 1) ^ ((1 << a) - 1)
        masks.append((np.uint32((m >> 32) & 0xFFFFFFFF),
                      np.uint32(m & 0xFFFFFFFF)))
    return masks


@functools.partial(jax.jit,
                   static_argnames=("e", "cpad", "mask_hi0", "mask_lo0",
                                    "mask_hi1", "mask_lo1", "mask_hi2",
                                    "mask_lo2"))
def _slab_join(qh, ql, dh, dl, docc, dvalid, qvalid, *,
               e: int, cpad: int, mask_hi0, mask_lo0, mask_hi1, mask_lo1,
               mask_hi2, mask_lo2):
    """One slab of bucket blocks: qh/ql (Bs, qpad), dh/dl/docc/dvalid
    (Bs, cpad), qvalid (Bs, qpad). Returns scaled sums (Bs, qpad) u32:
    Σ occ·(6/m) over pairs with 1 ≤ H ≤ e."""
    xh = qh[:, :, None] ^ dh[:, None, :]
    xl = ql[:, :, None] ^ dl[:, None, :]
    # per-base differ bits: fold each 2-bit symbol to its low lane
    yh = (xh | (xh >> 1)) & jnp.uint32(0x55555555)
    yl = (xl | (xl >> 1)) & jnp.uint32(0x55555555)
    ham = (jax.lax.population_count(yh)
           + jax.lax.population_count(yl)).astype(jnp.uint32)
    m = jnp.zeros(xh.shape, jnp.uint32)
    for mh, ml in ((mask_hi0, mask_lo0), (mask_hi1, mask_lo1),
                   (mask_hi2, mask_lo2)):
        exact = ((xh & jnp.uint32(mh)) | (xl & jnp.uint32(ml))) == 0
        m = m + exact.astype(jnp.uint32)
    ok = (ham >= 1) & (ham <= jnp.uint32(e)) \
        & qvalid[:, :, None] & dvalid[:, None, :]
    scale = jnp.where(m > 0, jnp.uint32(6) // jnp.maximum(m, 1),
                      jnp.uint32(0))
    contrib = jnp.where(ok, docc[:, None, :] * scale, jnp.uint32(0))
    return contrib.sum(axis=2, dtype=jnp.uint32)


def _bucketize(keys: np.ndarray, order: np.ndarray, n_buckets: int,
               pad: int):
    """(flat slot index into a (n_buckets*pad,) layout, in-bucket slot)
    for entries taken in sorted `order`. Entries beyond `pad` get the
    trash slot n_buckets*pad."""
    ks = keys[order]
    # in-bucket slot = position among equal keys (ks is sorted)
    first = np.ones(len(ks), bool)
    first[1:] = ks[1:] != ks[:-1]
    start = np.maximum.accumulate(np.where(first, np.arange(len(ks)), 0))
    slot = np.arange(len(ks)) - start
    flat = np.where(slot < pad, ks.astype(np.int64) * pad + slot,
                    n_buckets * pad)
    return flat, slot


def hamming_neighbor_sums(unique_kmers: np.ndarray, uniq: np.ndarray,
                          occ: np.ndarray, k: int, e: int,
                          cpad: int = 64, slab_buckets: int | None = None,
                          packed_rows=None, n_buckets_packed: int = 0,
                          batch_slow: int = 4096) -> np.ndarray:
    """Neighbor-occurrence sums for `unique_kmers` (queries) against the
    distinct-genome-k-mer multiset (`uniq` canonical u64, `occ` u8/u32
    saturated counts). Exact: identical to brute-force enumeration.

    packed_rows / n_buckets_packed: the packed table over `uniq` with
    occ in the pos payload, used for slow-path queries (overflowed
    buckets); built by the caller (pipelines.search already has it).
    """
    from quickmer2_tpu.ops.editdist import edit_table, neighbor_occr_sum_packed
    from quickmer2_tpu.ops.packed_table import PackedTable

    assert 1 <= e <= 2
    n = len(unique_kmers)
    if n == 0:
        return np.zeros(0, np.uint32)

    # database W = uniq ∪ rc(uniq) minus palindrome duplicates
    rc_db = _rc_np(uniq, k)
    pal = rc_db == uniq
    w = np.concatenate([uniq, rc_db[~pal]])
    w_occ = np.concatenate([occ, occ[~pal]]).astype(np.uint32)
    whi, wlo = codec.split_u64(w)
    qhi, qlo = codec.split_u64(np.asarray(unique_kmers, np.uint64))

    ranges = part_ranges(k)
    masks = _part_masks(k)
    mask_kw = {"mask_hi0": int(masks[0][0]), "mask_lo0": int(masks[0][1]),
               "mask_hi1": int(masks[1][0]), "mask_lo1": int(masks[1][1]),
               "mask_hi2": int(masks[2][0]), "mask_lo2": int(masks[2][1])}

    part_keys_w = [_extract_part_np(whi, wlo, s, t) for (s, t) in ranges]
    part_keys_q = [_extract_part_np(qhi, qlo, s, t) for (s, t) in ranges]
    n_bkts = [1 << (2 * (t - s)) for (s, t) in ranges]

    # slow-path mask: any part bucket of the QUERY overflows cpad
    slow = np.zeros(n, bool)
    hists = []
    for i in range(3):
        hist = np.bincount(part_keys_w[i], minlength=n_bkts[i])
        hists.append(hist)
        slow |= hist[part_keys_q[i]] > cpad
    fast_idx = np.flatnonzero(~slow)
    sums = np.zeros(n, np.uint64)

    if len(fast_idx):
        scaled = np.zeros(len(fast_idx) + 1, np.uint64)  # +1 trash
        fq_hi, fq_lo = qhi[fast_idx], qlo[fast_idx]
        for i in range(3):
            B = n_bkts[i]
            order_w = np.argsort(part_keys_w[i], kind="stable")
            wflat, _ = _bucketize(part_keys_w[i], order_w, B, cpad)
            dh = np.zeros(B * cpad + 1, np.uint32)
            dl = np.zeros(B * cpad + 1, np.uint32)
            docc = np.zeros(B * cpad + 1, np.uint32)
            dvalid = np.zeros(B * cpad + 1, bool)
            dh[wflat] = whi[order_w]
            dl[wflat] = wlo[order_w]
            docc[wflat] = w_occ[order_w]
            dvalid[wflat] = True
            dvalid[-1] = False

            kq = part_keys_q[i][fast_idx]
            order_q = np.argsort(kq, kind="stable")
            qflat, _ = _bucketize(kq, order_q, B, cpad)
            qh = np.zeros(B * cpad + 1, np.uint32)
            ql = np.zeros(B * cpad + 1, np.uint32)
            qidx = np.full(B * cpad + 1, len(fast_idx), np.int64)
            qvalid = np.zeros(B * cpad + 1, bool)
            qh[qflat] = fq_hi[order_q]
            ql[qflat] = fq_lo[order_q]
            qidx[qflat] = order_q
            qvalid[qflat] = True
            qvalid[-1] = False
            qidx[-1] = len(fast_idx)  # trash bin of `scaled`

            slab = slab_buckets or max(1, (1 << 24) // (cpad * cpad))
            for b0 in range(0, B, slab):
                b1 = min(b0 + slab, B)
                sl = slice(b0 * cpad, b1 * cpad)
                if not dvalid[sl].any() or not qvalid[sl].any():
                    continue
                shape = (b1 - b0, cpad)
                out = _slab_join(
                    jnp.asarray(qh[sl].reshape(shape)),
                    jnp.asarray(ql[sl].reshape(shape)),
                    jnp.asarray(dh[sl].reshape(shape)),
                    jnp.asarray(dl[sl].reshape(shape)),
                    jnp.asarray(docc[sl].reshape(shape)),
                    jnp.asarray(dvalid[sl].reshape(shape)),
                    jnp.asarray(qvalid[sl].reshape(shape)),
                    e=e, cpad=cpad, **mask_kw)
                np.add.at(scaled, qidx[sl], np.asarray(out).reshape(-1))
        part_sums, rem = divmod(scaled[:-1], 6)
        assert not rem.any(), "hamming join scale invariant violated"
        sums[fast_idx] = part_sums

    slow_idx = np.flatnonzero(slow)
    if len(slow_idx):
        if packed_rows is None:
            uhi, ulo = codec.split_u64(uniq)
            ptab = PackedTable.build(
                uhi, ulo, rank=np.arange(len(uniq), dtype=np.uint32),
                pos=np.asarray(occ, np.uint32))
            packed_rows = jnp.asarray(ptab.rows)
            n_buckets_packed = ptab.n_buckets
        p1, d1, p2, d2 = (jnp.asarray(a) for a in edit_table(k, e))
        sq = np.asarray(unique_kmers, np.uint64)[slow_idx]
        rc_q = _rc_np(sq, k)
        for off in range(0, len(sq), batch_slow):
            sl = slice(off, min(off + batch_slow, len(sq)))
            kh, kl = codec.split_u64(sq[sl])
            rh, rl = codec.split_u64(rc_q[sl])
            pad = batch_slow - (sl.stop - sl.start)
            if pad:
                kh, kl, rh, rl = (np.pad(a, (0, pad))
                                  for a in (kh, kl, rh, rl))
            out = neighbor_occr_sum_packed(
                jnp.asarray(kh), jnp.asarray(kl), jnp.asarray(rh),
                jnp.asarray(rl), packed_rows, p1, d1, p2, d2,
                k=k, n_buckets=n_buckets_packed)
            sums[slow_idx[sl]] = np.asarray(out)[: sl.stop - sl.start]

    return np.minimum(sums, np.iinfo(np.uint32).max).astype(np.uint32)


def _rc_np(kmers: np.ndarray, k: int) -> np.ndarray:
    rc = np.zeros_like(kmers)
    tmp = np.asarray(kmers, np.uint64).copy()
    for _ in range(k):
        rc = (rc << np.uint64(2)) | ((tmp - np.uint64(2)) & np.uint64(3))
        tmp >>= np.uint64(2)
    return rc & np.uint64((1 << (2 * k)) - 1)
