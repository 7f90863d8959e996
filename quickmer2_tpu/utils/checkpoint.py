"""Intra-phase checkpoint/resume for the count phase.

The reference's only "checkpointing" is phase-level file persistence
(SURVEY.md section 5: a count job that dies at read 75G of 81G restarts
from zero). Here the counter's device state is a single dense u32
vector, so a checkpoint is: (stream byte offset, parser state, depth
snapshot). Snapshots are cheap (n_kmers * 4 bytes) and atomic
(write-temp + rename).
"""

from __future__ import annotations

import json
import os

import numpy as np

MAGIC = "qm2tpu-count-ckpt-v1"


def save(path: str, byte_offset: int, depth: np.ndarray,
         extra: dict | None = None) -> None:
    tmp = path + ".tmp"
    meta = {"magic": MAGIC, "byte_offset": int(byte_offset),
            "n": int(len(depth)), **(extra or {})}
    with open(tmp, "wb") as f:
        header = json.dumps(meta).encode()
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        np.asarray(depth, np.uint32).tofile(f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load(path: str):
    """Returns (byte_offset, depth u32[n], meta) or None if absent."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        hlen = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(hlen))
        if meta.get("magic") != MAGIC:
            raise ValueError(f"{path}: not a count checkpoint")
        depth = np.fromfile(f, dtype=np.uint32, count=meta["n"])
    return meta["byte_offset"], depth, meta
