"""Dress rehearsal: full search → count → est on realistic synthetic
genomes (tools/realistic_genome.py — repeat families with divergence,
GC isochores, microsatellites, a segmental duplication at known CN).

Usage: python tools/rehearsal.py [n_mbases] [coverage]
       (defaults 8 Mb, 25x; the chr21-scale run is n_mbases=40)

Reports one JSON object of structured metrics: phase wall times, spill
and tier-2 rates, neighbor-bitmap density, filter survivor counts, and
the recovered CN of the planted duplication. This is VERDICT r3 item
#10 — the first numbers on non-uniform sequence (real FASTAs are not
reachable from this environment; the generator plants the structures
that drive anchor quality, bitmap density, and spill rate).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.realistic_genome import make_genome, to_fasta  # noqa: E402


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

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    coverage = float(sys.argv[2]) if len(sys.argv) > 2 else 25.0
    n_bases = int(mb * 1e6)
    read_len = 150
    dup_len = min(200_000, n_bases // 20)
    dup_copies = 2          # true CN = 2*(1+2) = 6
    err = 0.003
    out = {}
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
    search_pipe.run_search(
        fa, SearchConfig(kmer_size=30, hash_size=1 << 20, edit_distance=2,
                         edit_depth_threshold=100, window_size=1000,
                         control_bed=ctrl), verbose=True)
    out["search_s"] = round(time.time() - t1, 1)
    from quickmer2_tpu.dictionary import Dictionary
    dic = Dictionary.from_qm(fa + ".qm")
    out["n_kmers"] = dic.n_kmers
    out["dict_fraction"] = round(dic.n_kmers / max(len(g) - 29, 1), 4)

    n_reads = int(coverage * len(g) / read_len)
    reads = simulate_reads_codes(rng, g, n_reads, read_len, err)
    seg = g[seg_start:seg_start + seg_len]
    extra = simulate_reads_codes(
        rng, seg, int(2 * coverage * len(seg) / read_len), read_len, err)
    fq = os.path.join(d, "r.fq")
    write_fastq_codes(fq, np.concatenate([reads, extra]))
    out["n_reads"] = n_reads + len(extra)

    t2 = time.time()
    stats = run_count(fa + ".qm", fq, os.path.join(d, "s"), verbose=True,
                      mode="anchored", ref_fasta=fa)
    out["count_s"] = round(time.time() - t2, 1)
    out["count_stats"] = {k: v for k, v in stats.items()
                          if k in ("n_reads", "n_spilled", "n_spilled2",
                                   "mean_depth", "phases", "read_len")}
    out["spill_rate"] = round(stats["n_spilled"] / stats["n_reads"], 5)
    out["tier2_exact_rate"] = round(stats["n_spilled2"] / stats["n_reads"], 5)
    wall = stats["phases"]["stream_s"] + stats["phases"]["finish_s"]
    windows = stats["n_reads"] * (read_len - 29)
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
    out["dir"] = d
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
