"""Packed two-choice table tests: build invariants, probe parity with
the linear-probe host path, and count-pipeline equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

from quickmer2_tpu.ops import codec
from quickmer2_tpu.ops.packed_table import (
    ENTRIES_PER_BUCKET, PackedTable, probe_packed)


def test_build_places_every_key(rng):
    n = 50000
    keys = np.unique(rng.integers(1, 1 << 60, size=n, dtype=np.uint64))
    khi, klo = codec.split_u64(keys)
    rank = np.arange(len(keys), dtype=np.uint32)
    t = PackedTable.build(khi, klo, rank)
    flat = t.rows.reshape(-1, 4)
    stored = (flat[:, 0].astype(np.uint64) << np.uint64(32)) | flat[:, 1]
    nz = stored[flat[:, :2].any(axis=1)]
    assert len(nz) == len(keys)
    np.testing.assert_array_equal(np.sort(nz), np.sort(keys))
    # per-bucket entry count never exceeds capacity (trivially true by
    # construction, but guard the layout math)
    assert t.rows.shape == (t.n_buckets, 4 * ENTRIES_PER_BUCKET)


def test_probe_hits_and_misses(rng):
    keys = np.unique(rng.integers(1, 1 << 60, size=20000, dtype=np.uint64))
    khi, klo = codec.split_u64(keys)
    rank = np.arange(len(keys), dtype=np.uint32)
    pos = rng.integers(0, 2**32, size=len(keys), dtype=np.uint32)
    t = PackedTable.build(khi, klo, rank, pos)
    rows = t.device_rows()

    absent = rng.integers(1, 1 << 60, size=5000, dtype=np.uint64)
    absent = absent[~np.isin(absent, keys)]
    queries = np.concatenate([keys, absent, np.zeros(3, np.uint64)])
    qhi, qlo = codec.split_u64(queries)
    miss = np.uint32(len(keys))
    found, got_rank, got_pos = probe_packed(
        rows, jnp.asarray(qhi), jnp.asarray(qlo), t.n_buckets, jnp.uint32(miss))
    found = np.asarray(found)
    got_rank = np.asarray(got_rank)
    got_pos = np.asarray(got_pos)

    nk = len(keys)
    assert found[:nk].all()
    np.testing.assert_array_equal(got_rank[:nk], rank)
    np.testing.assert_array_equal(got_pos[:nk], pos)
    assert not found[nk:].any()          # absent and zero queries miss
    assert (got_rank[nk:] == miss).all()


def test_count_packed_matches_linear(tmp_path, rng):
    from quickmer2_tpu.config import SearchConfig
    from quickmer2_tpu.pipelines import search as search_pipe
    from quickmer2_tpu.pipelines.count import DepthCounter, make_packer
    from tests import helpers

    chr1 = helpers.random_genome(rng, 20000)
    fa = str(tmp_path / "g.fa")
    helpers.write_fasta(fa, {"c1": chr1})
    dic = search_pipe.run_search(
        fa, SearchConfig(kmer_size=30, hash_size=1 << 16, edit_distance=0,
                         window_size=100), verbose=False)
    reads = helpers.simulate_reads(rng, chr1, 3000, 100)
    blob = "".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)).encode()
    codes = make_packer("fasta-lines").feed(blob)

    outs = {}
    for layout in ("linear", "packed"):
        c = DepthCounter(dic, batch_bases=1 << 16, layout=layout)
        c.feed_codes(codes)
        outs[layout] = c.finish()
    np.testing.assert_array_equal(outs["packed"], outs["linear"])
    assert outs["packed"].sum() > 0


def test_sortjoin_layout_matches_packed(rng):
    """DepthCounter(layout="sortjoin") — the random-access-free
    sort-merge-join engine — must produce bit-identical depth."""
    from quickmer2_tpu.config import SearchConfig
    from quickmer2_tpu.pipelines import search as search_pipe
    from quickmer2_tpu.pipelines.count import DepthCounter, make_packer
    from tests import helpers
    import tempfile

    chrom = helpers.random_genome(rng, 20000)
    d = tempfile.mkdtemp()
    fa = d + "/g.fa"
    helpers.write_fasta(fa, {"c1": chrom})
    dic = search_pipe.run_search(
        fa, SearchConfig(kmer_size=30, hash_size=1 << 16, edit_distance=0,
                         window_size=100), verbose=False)
    reads = helpers.simulate_reads(rng, chrom, 1500, 100)
    reads += ["".join(rng.choice(list("ACGT"), size=100)) for _ in range(40)]
    reads = helpers.mutate_reads(rng, reads, 0.01)
    blob = "".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)).encode()
    codes = make_packer("fasta-lines").feed(blob)

    a = DepthCounter(dic, batch_bases=1 << 15, layout="packed")
    b = DepthCounter(dic, batch_bases=1 << 15, layout="sortjoin")
    a.feed_codes(codes)
    b.feed_codes(codes)
    np.testing.assert_array_equal(b.finish(), a.finish())
