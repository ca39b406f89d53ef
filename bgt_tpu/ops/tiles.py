"""Genotype tile store: HBM-friendly packed 2-bit genotype matrix.

The TPU-native device layout for a BGT database.  The on-disk PBF stays the
compact interchange format (PBWT+RLE, reference-compatible); at import time
(or lazily on first query) the matrix is ALSO materialized as two bit-planes
packed 32 haplotypes per uint32 word, row-major:

    plane0: (n_rows, n_words) uint32   # low genotype bit  (code & 1)
    plane1: (n_rows, n_words) uint32   # high genotype bit (code >> 1)

with genotype code = a1<<1|a0 in {0=ref, 1=alt, 2=missing, 3=<M>}
(reference acf.md:21-24).  This trades disk for speed-of-light device
scans: per-site AC/AN and per-group counts become masked popcounts on the
VPU (8 genotypes/byte of HBM traffic), replacing the reference's sequential
per-row RLE walk + scalar count loop (bgt.c:735-757, pbwt.c:129-170).

Column (haplotype) packing is little-endian within each word: haplotype j
lives in word j>>5 bit j&31, so numpy packbits(bitorder='little') and the
device kernels agree.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..formats.pbf import PbfReader

MAGIC_V1 = b"GTC\x01"
MAGIC = b"GTC\x02"  # v2 appends the per-row all-columns code-count aggregate
WORD_BITS = 32
# column padding: keep the uint8 view a multiple of 128 lanes * 4 sublanes
COL_ALIGN = 1024


def _pad_words(m: int) -> int:
    return (m + COL_ALIGN - 1) // COL_ALIGN * (COL_ALIGN // WORD_BITS)


class TileStore:
    """In-memory (optionally disk-cached) packed genotype matrix."""

    def __init__(self, n_rows: int, m: int, plane0: np.ndarray, plane1: np.ndarray,
                 rowstats: np.ndarray | None = None):
        self.n_rows = n_rows
        self.m = m  # real number of haplotype columns
        self.n_words = plane0.shape[1]
        self.plane0 = plane0
        self.plane1 = plane1
        # (n_rows, 4) int32 counts of codes 0..3 over all m columns — the
        # materialized aggregate behind all-samples AC/AN queries (the
        # reference recounts per query, bgt.c:735-757)
        self.rowstats = rowstats if rowstats is not None else self._calc_rowstats()

    def _calc_rowstats(self) -> np.ndarray:
        n10 = np.bitwise_count(self.plane0).sum(axis=1, dtype=np.int32)
        n11 = np.bitwise_count(self.plane1).sum(axis=1, dtype=np.int32)
        nb = np.bitwise_count(self.plane0 & self.plane1).sum(axis=1, dtype=np.int32)
        cnt1 = n10 - nb
        cnt2 = n11 - nb
        cnt0 = np.int32(self.m) - cnt1 - cnt2 - nb
        return np.stack([cnt0, cnt1, cnt2, nb], axis=1).astype(np.int32)

    # --- construction ------------------------------------------------------

    @classmethod
    def from_pbf(cls, path: str, progress: bool = False) -> "TileStore":
        pb = PbfReader(path)
        m = pb.m
        n_words = _pad_words(m)
        rows0 = []
        rows1 = []
        n = 0
        nbytes = n_words * 4
        while True:
            planes = pb.read_row()
            if planes is None:
                break
            b0 = np.packbits(planes[0], bitorder="little")
            b1 = np.packbits(planes[1], bitorder="little")
            r0 = np.zeros(nbytes, dtype=np.uint8)
            r1 = np.zeros(nbytes, dtype=np.uint8)
            r0[: b0.size] = b0
            r1[: b1.size] = b1
            rows0.append(r0)
            rows1.append(r1)
            n += 1
        pb.close()
        if n:
            plane0 = np.vstack(rows0).view(np.uint32)
            plane1 = np.vstack(rows1).view(np.uint32)
        else:
            plane0 = np.zeros((0, n_words), np.uint32)
            plane1 = np.zeros((0, n_words), np.uint32)
        return cls(n, m, plane0, plane1)

    @classmethod
    def from_codes(cls, codes: np.ndarray) -> "TileStore":
        """Build from a (n_rows, m) uint8 code matrix (tests, import)."""
        n, m = codes.shape
        nbytes = _pad_words(m) * 4
        p0 = np.packbits(codes & 1, axis=1, bitorder="little")
        p1 = np.packbits(codes >> 1, axis=1, bitorder="little")
        out0 = np.zeros((n, nbytes), np.uint8)
        out1 = np.zeros((n, nbytes), np.uint8)
        out0[:, : p0.shape[1]] = p0
        out1[:, : p1.shape[1]] = p1
        return cls(n, m, out0.view(np.uint32), out1.view(np.uint32))

    # --- disk cache --------------------------------------------------------

    def save(self, path: str) -> None:
        with open(path, "wb") as fp:
            fp.write(MAGIC)
            fp.write(struct.pack("<qii", self.n_rows, self.m, self.n_words))
            fp.write(np.ascontiguousarray(self.plane0).tobytes())
            fp.write(np.ascontiguousarray(self.plane1).tobytes())
            fp.write(np.ascontiguousarray(self.rowstats).tobytes())

    @classmethod
    def load(cls, path: str) -> "TileStore":
        """Memory-map the planes (read-only): cold-start queries that are
        served by the rowstats aggregate never fault the matrix in at all."""
        with open(path, "rb") as fp:
            magic = fp.read(4)
            if magic not in (MAGIC, MAGIC_V1):
                raise ValueError("not a GTC tile file")
            n_rows, m, n_words = struct.unpack("<qii", fp.read(16))
            hdr = fp.tell()
        plane_elems = n_rows * n_words
        data = np.memmap(path, dtype=np.uint32, mode="r", offset=hdr,
                         shape=(2 * plane_elems,))
        stats = None
        if magic == MAGIC:
            raw = np.memmap(path, dtype=np.int32, mode="r",
                            offset=hdr + 8 * plane_elems)
            if raw.size >= 4 * n_rows:
                # rowstats are small and hot: materialize them
                stats = np.array(raw[: 4 * n_rows]).reshape(n_rows, 4)
        plane0 = data[:plane_elems].reshape(n_rows, n_words)
        plane1 = data[plane_elems:].reshape(n_rows, n_words)
        return cls(n_rows, m, plane0, plane1, rowstats=stats)

    @classmethod
    def open_or_build(cls, prefix: str) -> "TileStore":
        """Load ``prefix.gtc`` if fresh, else build from ``prefix.pbf``."""
        gtc = prefix + ".gtc"
        pbf = prefix + ".pbf"
        if os.path.exists(gtc) and os.path.getmtime(gtc) >= os.path.getmtime(pbf):
            return cls.load(gtc)
        from .. import native
        try:
            if native.gtc_from_pbf(pbf, gtc) is not None:
                return cls.load(gtc)
        except OSError:
            pass
        ts = cls.from_pbf(pbf)
        try:
            ts.save(gtc)
        except OSError:
            pass
        return ts

    # --- masks -------------------------------------------------------------

    def all_mask(self) -> np.ndarray:
        """(n_words,) uint32 mask covering all m real columns."""
        mask = np.zeros(self.n_words, dtype=np.uint32)
        full, rem = divmod(self.m, WORD_BITS)
        mask[:full] = 0xFFFFFFFF
        if rem:
            mask[full] = (1 << rem) - 1
        return mask

    def pack_mask(self, cols: np.ndarray) -> np.ndarray:
        """(n_words,) uint32 mask with the given haplotype columns set."""
        bits = np.zeros(self.n_words * WORD_BITS, dtype=np.uint8)
        bits[np.asarray(cols, dtype=np.int64)] = 1
        return np.packbits(bits, bitorder="little").view(np.uint32)

    def group_masks(self, group_of_sample: np.ndarray, n_groups: int,
                    sample_cols: np.ndarray) -> np.ndarray:
        """(n_groups, n_words) masks; sample i covers columns 2i, 2i+1.

        ``group_of_sample``: per-output-sample group id (1-based, as in the
        reference's group[] array); ``sample_cols``: original sample index
        per output sample.
        """
        masks = np.zeros((n_groups, self.n_words), dtype=np.uint32)
        for g in range(1, n_groups + 1):
            samples = sample_cols[group_of_sample == g]
            cols = np.empty(samples.size * 2, dtype=np.int64)
            cols[0::2] = samples * 2
            cols[1::2] = samples * 2 + 1
            masks[g - 1] = self.pack_mask(cols)
        return masks

    # --- decode ------------------------------------------------------------

    def codes(self, rows: np.ndarray, cols: np.ndarray | None = None) -> np.ndarray:
        """(len(rows), m or len(cols)) uint8 genotype codes (host path)."""
        p0 = self.plane0[rows]
        p1 = self.plane1[rows]
        b0 = np.unpackbits(p0.view(np.uint8), axis=1, bitorder="little")
        b1 = np.unpackbits(p1.view(np.uint8), axis=1, bitorder="little")
        codes = (b1 << 1) | b0
        if cols is not None:
            return codes[:, cols]
        return codes[:, : self.m]
