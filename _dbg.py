import numpy as np
from quickmer2_tpu.ops import codec
from quickmer2_tpu.ops.packed_table import _try_place, bucket_hashes, ENTRIES_PER_BUCKET
from quickmer2_tpu.ops.hash import djb_pair_np

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, size=1 << 21).astype(np.uint8)
canon, valid = codec.sliding_kmers_np(genome, 30)
kmers = np.unique(canon[valid & (canon != 0)])
khi, klo = codec.split_u64(kmers)
n = len(kmers)
h = djb_pair_np(khi, klo)
for nb in (1 << 22, 1 << 23):
    h1, h2 = bucket_hashes(h, nb)
    print(f"n_buckets {nb}: distinct h1 {len(np.unique(h1))}, "
          f"load {n/(nb*ENTRIES_PER_BUCKET):.3f}")
    rows = _try_place(khi, klo, np.arange(n, dtype=np.uint32),
                      np.zeros(n, np.uint32), h, nb)
    print("  placed:", rows is not None)
