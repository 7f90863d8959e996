"""Anchored range-add counting: differential tests against the exact
per-k-mer path. Any divergence is a correctness bug (anchoring quality
may only affect speed, never results)."""

import numpy as np
import pytest

from quickmer2_tpu.config import SearchConfig
from quickmer2_tpu.ops import codec
from quickmer2_tpu.ops.anchored import (
    AnchoredDepthCounter, AnchoredIndex, rows_from_flat_codes)
from quickmer2_tpu.pipelines import search as search_pipe
from quickmer2_tpu.pipelines.count import DepthCounter, make_packer
from tests import helpers

K = 30
READ_LEN = 100


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(77)
    d = tmp_path_factory.mktemp("anch")
    # two chromosomes, one with an N gap and a repeated segment (the
    # repeat's k-mers are non-unique → absent from the dictionary)
    rep = helpers.random_genome(rng, 1500)
    chr1 = (helpers.random_genome(rng, 15000) + rep + "N" * 40
            + helpers.random_genome(rng, 8000) + rep)
    chr2 = helpers.random_genome(rng, 6000)
    fa = str(d / "g.fa")
    helpers.write_fasta(fa, {"c1": chr1, "c2": chr2})
    dic = search_pipe.run_search(
        fa, SearchConfig(kmer_size=K, hash_size=1 << 16, edit_distance=0,
                         window_size=100), verbose=False)
    index = AnchoredIndex.from_dictionary_and_fasta(dic, fa)
    return {"dic": dic, "index": index, "chr1": chr1, "chr2": chr2,
            "rng": rng, "fa": fa}


def _depths(world, reads):
    """(anchored depth, direct depth) for a list of read strings."""
    blob = "".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)).encode()
    codes = make_packer("fasta-lines").feed(blob)

    direct = DepthCounter(world["dic"], batch_bases=1 << 16, layout="packed")
    direct.feed_codes(codes)
    d_direct = direct.finish()

    rows = rows_from_flat_codes(codes, READ_LEN)
    anch = AnchoredDepthCounter(world["index"], K, READ_LEN,
                                batch_reads=512)
    anch.feed_reads(rows)
    d_anch = anch.finish()
    return d_anch, d_direct, anch


def test_clean_reads(world):
    rng = np.random.default_rng(1)
    reads = (helpers.simulate_reads(rng, world["chr1"], 1200, READ_LEN)
             + helpers.simulate_reads(rng, world["chr2"], 400, READ_LEN))
    d_anch, d_direct, anch = _depths(world, reads)
    np.testing.assert_array_equal(d_anch, d_direct)
    assert d_direct.sum() > 0
    # clean reads rarely spill; the spills here are reads fully inside
    # the repeated segment (no dictionary k-mers → nothing to anchor on)
    assert anch.n_spilled < anch.n_reads * 0.12


def test_reads_with_errors(world):
    rng = np.random.default_rng(2)
    reads = helpers.simulate_reads(rng, world["chr1"], 800, READ_LEN)
    noisy = []
    for r in reads:
        rl = list(r)
        for _ in range(rng.integers(0, 4)):   # 0-3 substitutions
            p = rng.integers(0, len(rl))
            rl[p] = "ACGT"[rng.integers(0, 4)]
        noisy.append("".join(rl))
    d_anch, d_direct, _ = _depths(world, noisy)
    np.testing.assert_array_equal(d_anch, d_direct)


def test_unmappable_and_garbage_reads(world):
    rng = np.random.default_rng(3)
    reads = [helpers.random_genome(rng, READ_LEN) for _ in range(300)]
    reads += ["N" * READ_LEN] * 5
    reads += [helpers.random_genome(rng, 40)] * 10      # short reads
    reads += helpers.simulate_reads(rng, world["chr1"], 100, READ_LEN)
    d_anch, d_direct, _ = _depths(world, reads)
    np.testing.assert_array_equal(d_anch, d_direct)


def test_reads_over_repeats_and_gaps(world):
    rng = np.random.default_rng(4)
    chr1 = world["chr1"]
    # reads straddling the N gap and the repeated (non-unique) segment
    gap = chr1.find("N")
    reads = []
    for off in range(-80, 20, 7):
        reads.append(chr1[gap + off : gap + off + READ_LEN])
    rep_at = 15000
    for off in range(-60, 1560, 37):
        reads.append(chr1[rep_at + off : rep_at + off + READ_LEN])
    reads = [r for r in reads if len(r) == READ_LEN]
    d_anch, d_direct, _ = _depths(world, reads)
    np.testing.assert_array_equal(d_anch, d_direct)


def test_mixed_strand_reads(world):
    rng = np.random.default_rng(5)
    fwd = helpers.simulate_reads(rng, world["chr1"], 500, READ_LEN)
    # simulate_reads already flips ~half; add guaranteed RC reads
    rc = [helpers.revcomp(r) for r in fwd[:100]]
    d_anch, d_direct, _ = _depths(world, fwd + rc)
    np.testing.assert_array_equal(d_anch, d_direct)


def test_chimeric_reads(world):
    """Reads stitched from two distant loci — anchor at one locus, half
    the read mismatches → dirty k-mers / spill; must stay exact."""
    chr1, chr2 = world["chr1"], world["chr2"]
    reads = []
    for i in range(200):
        a = chr1[1000 + 13 * i : 1000 + 13 * i + READ_LEN // 2]
        b = chr2[500 + 11 * i : 500 + 11 * i + READ_LEN - len(a)]
        if len(a) + len(b) == READ_LEN:
            reads.append(a + b)
    d_anch, d_direct, _ = _depths(world, reads)
    np.testing.assert_array_equal(d_anch, d_direct)
