"""Dress rehearsal: full search → count → est on realistic synthetic
genomes (tools/realistic_genome.py — repeat families with divergence,
GC isochores, microsatellites, a segmental duplication at known CN).

Usage: python tools/rehearsal.py [n_mbases] [coverage]
       (defaults 8 Mb, 25x; the chr21-scale run is n_mbases=40)
       python tools/rehearsal.py hifi [n_mbases] [coverage]
       (BASELINE config 5: 15-20 kb HiFi-shaped reads at 0.3%/bp against
        a sparse-thinned dictionary — every read exceeds the anchored
        row width and is sliced into k-1-overlap segments that ride the
        anchored fast path (ops.anchored.rows_from_flat_codes);
        reference long-read contract: /root/reference/README.md:126-130)

Reports one JSON object of structured metrics: phase wall times
(index_build_s separated, with a GRCh38 extrapolation), peak host RSS,
spill and tier-2 rates, neighbor-bitmap density, filter survivor
counts, and the recovered CN of the planted duplication.
"""

import json
import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.realistic_genome import make_genome, to_fasta  # noqa: E402

GRCH38_BASES = 3.1e9


def peak_rss_mb() -> int:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def simulate_reads_codes(rng, g, n_reads, read_len, err):
    starts = rng.integers(0, len(g) - read_len, size=n_reads)
    reads = g[starts[:, None] + np.arange(read_len)[None, :]].copy()
    n_err = rng.binomial(n_reads * read_len, err)
    er = rng.integers(0, n_reads, size=n_err)
    ec = rng.integers(0, read_len, size=n_err)
    reads[er, ec] = (reads[er, ec] + rng.integers(1, 4, size=n_err)) % 4
    flip = rng.random(n_reads) < 0.5
    reads[flip] = ((reads[flip, ::-1] + 2) % 4).astype(np.uint8)
    return reads


_LUT = np.frombuffer(b"ACTG", np.uint8)


def write_fastq_varlen(path, rng, g, total_bases, len_lo, len_hi, err,
                       extra_seg=None, extra_bases=0):
    """Variable-length HiFi-shaped FASTQ: read lengths uniform in
    [len_lo, len_hi], substitution errors at err/bp, half rc. Returns
    (n_reads, n_bases). extra_seg plants additional coverage over a
    sub-sequence (the CNV)."""
    n_reads = 0
    n_bases = 0
    with open(path, "wb") as f:
        jobs = [(g, total_bases)]
        if extra_seg is not None:
            jobs.append((extra_seg, extra_bases))
        for src, budget in jobs:
            while budget > 0:
                ln = int(rng.integers(len_lo, len_hi + 1))
                ln = min(ln, len(src) - 1)
                s = int(rng.integers(0, len(src) - ln))
                r = src[s:s + ln].copy()
                ne = rng.binomial(ln, err)
                if ne:
                    pos = rng.integers(0, ln, size=ne)
                    r[pos] = (r[pos] + rng.integers(1, 4, size=ne)) % 4
                if rng.random() < 0.5:
                    r = ((r[::-1] + 2) % 4).astype(np.uint8)
                f.write(b"@r\n" + _LUT[r].tobytes() + b"\n+\n"
                        + b"I" * ln + b"\n")
                budget -= ln
                n_reads += 1
                n_bases += ln
    return n_reads, n_bases


def write_fastq_codes(path, reads):
    lut = np.frombuffer(b"ACTG", np.uint8)
    R, L = reads.shape
    rec = 3 + L + 1 + 2 + L + 1
    blob = np.empty((R, rec), np.uint8)
    blob[:, 0] = ord("@")
    blob[:, 1] = ord("r")
    blob[:, 2] = ord("\n")
    blob[:, 3:3 + L] = lut[reads]
    blob[:, 3 + L] = ord("\n")
    blob[:, 4 + L] = ord("+")
    blob[:, 5 + L] = ord("\n")
    blob[:, 6 + L:6 + 2 * L] = ord("I")
    blob[:, 6 + 2 * L] = ord("\n")
    with open(path, "wb") as f:
        f.write(blob.tobytes())


def main():
    # the axon TPU plugin force-sets JAX_PLATFORMS in the env, so honor
    # an explicit platform request through jax.config (authoritative)
    plat = os.environ.get("QM2_BENCH_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    from quickmer2_tpu.config import SearchConfig
    from quickmer2_tpu.io import formats
    from quickmer2_tpu.pipelines import search as search_pipe
    from quickmer2_tpu.pipelines.count import run_count
    from quickmer2_tpu.pipelines.est import run_est

    args = sys.argv[1:]
    hifi = bool(args) and args[0] == "hifi"
    if hifi:
        args = args[1:]
    mb = float(args[0]) if args else 8.0
    coverage = float(args[1]) if len(args) > 1 else 25.0
    n_bases = int(mb * 1e6)
    read_len = 150
    dup_len = min(200_000, n_bases // 20)
    dup_copies = 2          # true CN = 2*(1+2) = 6
    err = 0.003
    out = {"config": "hifi-sparse" if hifi else "illumina"}
    rng = np.random.default_rng(12)
    d = tempfile.mkdtemp(prefix="rehearsal-")

    t0 = time.time()
    g, dup_start, dup_len = make_genome(rng, n_bases, dup_len, dup_copies)
    fa = os.path.join(d, "g.fa")
    to_fasta(fa, g)
    out["genome_bases"] = len(g)
    out["gen_s"] = round(time.time() - t0, 1)

    # the planted CNV: extra reads over a unique segment (the dup's own
    # k-mers are non-unique and excluded from the dictionary, so CN
    # signal must come from a copy-neutral-in-reference region)
    seg_start = 4 * len(g) // 5
    seg_len = min(100_000, len(g) // 40)

    # control bed: everything except the duplicated segment AND the
    # CNV segment (+margin) — control regions define the depth-vs-GC
    # curve, so a CNV inside them would pollute its own GC bins and
    # bias the correction (the same contract the reference tutorial's
    # curated control bed satisfies). Terminated off-chromosome
    # (stuck-last-row quirk).
    ctrl = os.path.join(d, "ctrl.bed")
    excl = sorted([(dup_start - 500, dup_start + dup_len + 500),
                   (seg_start - 500, seg_start + seg_len + 500)])
    with open(ctrl, "w") as f:
        prev = 0
        for a, b in excl:
            f.write(f"chr1\t{prev}\t{a}\n")
            prev = b
        f.write(f"chr1\t{prev}\t{len(g)}\n")
        f.write("chrZ\t0\t100\n")

    t1 = time.time()
    search_stats = {}
    search_pipe.run_search(
        fa, SearchConfig(kmer_size=30, hash_size=1 << 20, edit_distance=2,
                         edit_depth_threshold=100, window_size=1000,
                         control_bed=ctrl), verbose=True, stats=search_stats)
    out["search_s"] = round(time.time() - t1, 1)
    out["search_stats"] = search_stats
    from quickmer2_tpu.dictionary import Dictionary
    dic = Dictionary.from_qm(fa + ".qm")
    out["n_kmers"] = dic.n_kmers
    out["dict_fraction"] = round(dic.n_kmers / max(len(g) - 29, 1), 4)

    qm = fa + ".qm"
    if hifi:
        # BASELINE config 5: thin the dictionary to >=1 k-mer / 100 bp
        # (regenerates .bed/.qgc against the thinned set) and stream
        # 15-20 kb reads — each is sliced into k-1-overlap row segments
        # and rides the anchored fast path (VERDICT r4 Missing #2)
        from quickmer2_tpu.pipelines.sparse import run_sparse
        t_sp = time.time()
        sdic = run_sparse(fa, 100, window_size=100, control_bed=ctrl,
                          verbose=True)
        out["sparse_s"] = round(time.time() - t_sp, 1)
        out["n_kmers_thinned"] = sdic.n_kmers
        qm = fa + ".rqm"
        dic = sdic

    # anchored index build, timed separately from the count (the .qai
    # is the artifact every anchored count depends on; VERDICT r3
    # Missing #3 asks for its cost per Mb + a GRCh38 extrapolation)
    from quickmer2_tpu.ops.anchored import AnchoredIndex
    t_idx = time.time()
    AnchoredIndex.from_dictionary_and_fasta(dic, fa, cache_path=fa + ".qai")
    out["index_build_s"] = round(time.time() - t_idx, 1)
    out["index_build_s_per_mb"] = round(out["index_build_s"] / mb, 2)
    out["index_grch38_extrapolation_h"] = round(
        out["index_build_s"] * GRCH38_BASES / len(g) / 3600, 2)

    fq = os.path.join(d, "r.fq")
    seg = g[seg_start:seg_start + seg_len]
    if hifi:
        n_reads, nb = write_fastq_varlen(
            fq, rng, g, int(coverage * len(g)), 15_000, 20_000, err,
            extra_seg=seg, extra_bases=int(2 * coverage * len(seg)))
        out["n_reads"] = n_reads
        out["read_bases"] = nb
        mean_read_len = nb / n_reads
    else:
        n_reads = int(coverage * len(g) / read_len)
        reads = simulate_reads_codes(rng, g, n_reads, read_len, err)
        extra = simulate_reads_codes(
            rng, seg, int(2 * coverage * len(seg) / read_len), read_len, err)
        write_fastq_codes(fq, np.concatenate([reads, extra]))
        out["n_reads"] = n_reads + len(extra)
        mean_read_len = read_len

    t2 = time.time()
    stats = run_count(qm, fq, os.path.join(d, "s"), verbose=True,
                      mode="anchored", ref_fasta=fa)
    out["count_s"] = round(time.time() - t2, 1)
    out["count_stats"] = {k: v for k, v in stats.items()
                          if k in ("n_reads", "n_spilled", "n_spilled2",
                                   "mean_depth", "phases", "read_len",
                                   "overflow_windows", "n_long_reads",
                                   "n_segments")
                          or k.startswith(("phase_", "overflow_phase_"))}
    # n_reads counts anchored ROWS (long reads ride as k-1-overlap
    # segments, so rows > FASTQ records); rates are per row
    anchored_rows = stats.get("n_reads", 0)
    if anchored_rows:
        out["spill_rate"] = round(stats["n_spilled"] / anchored_rows, 5)
        out["tier2_exact_rate"] = round(stats["n_spilled2"] / anchored_rows, 5)
    # exact window count: every read of length L yields L-k+1 windows
    windows = (out.get("read_bases", out["n_reads"] * int(mean_read_len))
               - out["n_reads"] * 29)
    out["overflow_window_fraction"] = round(
        stats.get("overflow_windows", 0) / max(windows, 1), 5)
    wall = stats["phases"]["stream_s"] + stats["phases"]["finish_s"]
    out["count_kmers_per_s"] = round(windows / wall)

    # neighbor-bit density of the .qai index
    qai = fa + ".qai"
    _, _, tiles, _, _, _ = formats.read_qai(qai)
    out["neighbor_bit_density"] = round(
        float((np.asarray(tiles) & 0x78 != 0).mean()), 5)

    t3 = time.time()
    run_est(fa, os.path.join(d, "s"), os.path.join(d, "s.CN.bed"),
            verbose=True)
    out["est_s"] = round(time.time() - t3, 1)

    cn_rows = [ln.split() for ln in open(os.path.join(d, "s.CN.bed"))]
    cn = np.array([[float(r[1]), float(r[2]), float(r[3])] for r in cn_rows])
    in_seg = (cn[:, 0] >= seg_start) & (cn[:, 1] <= seg_start + seg_len)
    base = (cn[:, 1] < dup_start - 1000) | (cn[:, 0] > dup_start + dup_len + 1000)
    base &= ~in_seg
    out["baseline_cn"] = round(float(np.mean(cn[base, 2])), 3)
    out["planted_cnv_cn"] = round(float(np.mean(cn[in_seg, 2])), 3) \
        if in_seg.any() else None
    out["expected_cnv_cn"] = 6.0
    out["total_s"] = round(time.time() - t0, 1)
    out["peak_rss_mb"] = peak_rss_mb()
    out["dir"] = d
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
