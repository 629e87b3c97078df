"""Read-only out-of-core lookup map — the LMDB analogue.

The reference keeps lookup tables that exceed the heap (lobid-gnd
scale) in a read-only memory-mapped LMDB B-tree opened once per process
(reference core/src/main/java/hbz/limetrans/util/LMDB.java:30-152,
wired via ``put_lmdbmap`` — main/.../function/PutLmdbMap.java:14-24).
This is the same capability on numpy mmaps, no external store:

layout (directory)::

    keys.npy   sorted uint64 key hashes            (8 B/entry, mmap'd)
    koff.npy   uint64 offsets into kblob (n+1)
    kblob.bin  utf-8 key bytes (collision verification)
    voff.npy   uint64 offsets into vblob (n+1)
    vblob.bin  utf-8 value bytes

``open()`` maps the arrays read-only — per-node page cache is shared
across every actor on the machine and nothing lives in the Python heap;
``get`` is a binary search + two blob slices. Duplicate-hash entries
(collisions between distinct keys) are stored adjacent and resolved by
comparing key bytes. Build is one sorted pass; the layout is immutable
(the reference opens LMDB read-only too).
"""

from __future__ import annotations

import os

import numpy as np

from ..functions.textstats import stable_hash64


class DiskMap:
    @staticmethod
    def build(path: str, items) -> "DiskMap":
        """Write the map from an iterable of (key, value) string pairs
        (last write wins per key, like a dict)."""
        dedup: dict[str, str] = {str(k): str(v) for k, v in items}
        entries = sorted(
            ((stable_hash64(k), k, v) for k, v in dedup.items()),
            key=lambda e: (e[0], e[1]),
        )
        os.makedirs(path, exist_ok=True)
        hashes = np.fromiter((e[0] for e in entries), dtype=np.uint64, count=len(entries))
        kparts = [e[1].encode() for e in entries]
        vparts = [e[2].encode() for e in entries]
        koff = np.zeros(len(entries) + 1, dtype=np.uint64)
        np.cumsum([len(b) for b in kparts], out=koff[1:])
        voff = np.zeros(len(entries) + 1, dtype=np.uint64)
        np.cumsum([len(b) for b in vparts], out=voff[1:])
        np.save(os.path.join(path, "keys.npy"), hashes)
        np.save(os.path.join(path, "koff.npy"), koff)
        np.save(os.path.join(path, "voff.npy"), voff)
        with open(os.path.join(path, "kblob.bin"), "wb") as fh:
            fh.write(b"".join(kparts))
        with open(os.path.join(path, "vblob.bin"), "wb") as fh:
            fh.write(b"".join(vparts))
        return DiskMap.open(path)

    @staticmethod
    def open(path: str) -> "DiskMap":
        m = DiskMap()
        m.path = path
        m.hashes = np.load(os.path.join(path, "keys.npy"), mmap_mode="r")
        m.koff = np.load(os.path.join(path, "koff.npy"), mmap_mode="r")
        m.voff = np.load(os.path.join(path, "voff.npy"), mmap_mode="r")
        m.kblob = np.memmap(os.path.join(path, "kblob.bin"), dtype=np.uint8, mode="r")
        m.vblob = np.memmap(os.path.join(path, "vblob.bin"), dtype=np.uint8, mode="r")
        return m

    def __len__(self) -> int:
        return len(self.hashes)

    def _key_at(self, i: int) -> str:
        return bytes(self.kblob[int(self.koff[i]) : int(self.koff[i + 1])]).decode()

    def _val_at(self, i: int) -> str:
        return bytes(self.vblob[int(self.voff[i]) : int(self.voff[i + 1])]).decode()

    def get(self, key: str, default=None):
        h = np.uint64(stable_hash64(str(key)))
        i = int(np.searchsorted(self.hashes, h))
        while i < len(self.hashes) and self.hashes[i] == h:
            if self._key_at(i) == str(key):
                return self._val_at(i)
            i += 1  # adjacent same-hash entry (collision)
        return default

    def get_many(self, keys) -> list:
        """Vectorized probe: one searchsorted over the batch, then blob
        slices for the hits only."""
        ks = [str(k) for k in keys]
        hs = np.fromiter(
            (stable_hash64(k) for k in ks), dtype=np.uint64, count=len(ks)
        )
        idx = np.searchsorted(self.hashes, hs)
        out = []
        n = len(self.hashes)
        for j, (i, h, k) in enumerate(zip(idx, hs, ks)):
            i = int(i)
            v = None
            while i < n and self.hashes[i] == h:
                if self._key_at(i) == k:
                    v = self._val_at(i)
                    break
                i += 1
            out.append(v)
        return out
