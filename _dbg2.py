import numpy as np
from quickmer2_tpu.ops import codec
from quickmer2_tpu.ops.packed_table import _try_place
from quickmer2_tpu.ops.hash import djb_pair_np

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, size=1 << 21).astype(np.uint8)
canon, valid = codec.sliding_kmers_np(genome, 30)
valid = valid & (canon != 0)
kmers = canon[valid]
_, first = np.unique(kmers, return_index=True)
keep = np.zeros(len(kmers), bool)
keep[np.sort(first)] = True
uniq, counts = np.unique(kmers, return_counts=True)
keep &= ~np.isin(kmers, uniq[counts > 1])
dict_kmers = kmers[keep]            # GENOME order, like bench
khi, klo = codec.split_u64(dict_kmers)
n = len(dict_kmers)
h = djb_pair_np(khi, klo)
rows = _try_place(khi, klo, np.arange(n, dtype=np.uint32),
                  np.zeros(n, np.uint32), h, 1 << 22)
print("genome-order placed at 4M:", rows is not None)
