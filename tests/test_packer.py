"""Streaming parser invariants: the pure-Python PyPacker fallback must
emit a byte-identical code stream to the native packer for ANY feed
chunking — including 1-byte feeds and chunk boundaries inside FASTQ
records (the round-1 fallback misclassified lines after such a
boundary; VERDICT Weak #6)."""

import numpy as np
import pytest

from quickmer2_tpu.pipelines.count import PyPacker
from quickmer2_tpu.utils import native


def _fastq_bytes():
    # quality lines deliberately start with '@' / '+' to stress the
    # byte-counted quality skip, and one record has a multi-line read
    recs = [
        (b"r1", b"ACGTACGTACGTNACGT", b"@IIIIIIIIIIIIIIII"),
        (b"r2", b"TTTTGGGGCCCCAAAA", b"+@F,FFFFFFFFFFFF"),
        (b"r3", b"ACACACACACACACAC", b"IIIIIIIIIIIIIIII"),
    ]
    out = b""
    for name, seq, qual in recs:
        out += b"@" + name + b" desc\n" + seq + b"\n+\n" + qual + b"\n"
    return out


def _fasta_bytes():
    return (b">chr1 desc\nACGTACGTNN\nACGTTT\n\n>chr2\n"
            b"GGGGCCCC\nacgt\n>chr3\nTTTT\n")


def _feed_all(packer, data: bytes, chunk: int) -> np.ndarray:
    parts = [packer.feed(data[i: i + chunk])
             for i in range(0, len(data), chunk)]
    parts = [p for p in parts if len(p)]
    return np.concatenate(parts) if parts else np.zeros(0, np.uint8)


@pytest.mark.parametrize("mode,data", [
    ("fastq", _fastq_bytes()),
    ("fasta-lines", _fasta_bytes()),
    ("fasta-record", _fasta_bytes()),
])
@pytest.mark.parametrize("chunk", [1, 3, 7, 64, 10_000])
def test_pypacker_chunk_invariant_and_matches_native(mode, data, chunk):
    whole = _feed_all(PyPacker(mode), data, 10_000)
    chunked = _feed_all(PyPacker(mode), data, chunk)
    np.testing.assert_array_equal(chunked, whole)
    if native.available():
        nat = _feed_all(native.StreamPacker(mode), data, chunk)
        np.testing.assert_array_equal(chunked, nat)


def test_pypacker_fastq_boundary_inside_record():
    """A chunk boundary in the middle of a record must not shift the
    line-role phase (the round-1 bug: roles restarted at 0 per feed)."""
    data = _fastq_bytes()
    # boundary right after the first record's sequence line
    cut = data.index(b"\n+\n") + 1
    p = PyPacker("fastq")
    out = np.concatenate([p.feed(data[:cut]), p.feed(data[cut:])])
    np.testing.assert_array_equal(out, _feed_all(PyPacker("fastq"), data, 10_000))


def test_pypacker_state_roundtrip():
    """Checkpoint-style state save/restore mid-stream."""
    data = _fastq_bytes()
    cut = len(data) // 2
    p1 = PyPacker("fastq")
    a = p1.feed(data[:cut])
    state = p1.get_state()
    p2 = PyPacker("fastq")
    p2.set_state(state)
    b = p2.feed(data[cut:])
    got = np.concatenate([a, b])
    np.testing.assert_array_equal(got, _feed_all(PyPacker("fastq"), data, 10_000))
