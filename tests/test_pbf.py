"""PBWT/PBF codec tests: round trips, oracle parity via pbfview, seeks, subsets."""

import subprocess

import numpy as np
import pytest

from bgt_tpu.formats import pbf


def rand_matrix(rng, n_rows, m, g=2, p1=0.3):
    """Random g-bit integer matrix as (n_rows, m) values in [0, 2**g)."""
    return (rng.random((n_rows, m)) < p1).astype(np.uint8) + (
        (rng.random((n_rows, m)) < 0.05).astype(np.uint8) << 1
    )


def to_pim(mat, g=2) -> str:
    lines = [f"PIM1 {mat.shape[1]} {g}"]
    for row in mat:
        lines.append(" ".join(str(int(x)) for x in row))
    return "\n".join(lines) + "\n"


def write_pbf(path, mat, g=2, shift=13):
    w = pbf.PbfWriter(str(path), mat.shape[1], g, shift)
    for row in mat:
        w.write_row([(row >> k) & 1 for k in range(g)])
    w.close()


def read_pbf(path, g=2, sub=None, start=0, n=None):
    r = pbf.PbfReader(str(path))
    if start:
        r.seek(start)
    if sub is not None:
        r.subset(sub)
    rows = []
    while n is None or len(rows) < n:
        planes = r.read_row()
        if planes is None:
            break
        rows.append(sum((p.astype(np.uint8) << k) for k, p in enumerate(planes)))
    r.close()
    return np.array(rows, dtype=np.uint8)


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for m in [1, 2, 5, 16, 100, 1000, 70000]:
        u = (rng.random(m) < 0.2).astype(np.uint8)
        enc = pbf.rle_encode(u)
        assert np.array_equal(pbf.rle_expand(enc, m), u)
        assert pbf.rle_count1(enc) == int(u.sum())
    # constant rows
    for m in [1, 15, 16, 17, 255, 256, 65536]:
        for b in (0, 1):
            u = np.full(m, b, dtype=np.uint8)
            enc = pbf.rle_encode(u)
            assert np.array_equal(pbf.rle_expand(enc, m), u)


def test_pbf_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    mat = rand_matrix(rng, 100, 37)
    p = tmp_path / "t.pbf"
    write_pbf(p, mat, shift=4)
    out = read_pbf(p)
    assert np.array_equal(out, mat)


def test_pbf_matches_reference_bytes(tmp_path, ref_pbfview):
    """Our PBF writer must produce byte-identical files to the reference."""
    rng = np.random.default_rng(2)
    mat = rand_matrix(rng, 123, 53)
    pim = to_pim(mat)
    res = subprocess.run(
        [ref_pbfview, "-S", "-b", "-s", "4", "-"],
        input=pim.encode(), capture_output=True, check=True,
    )
    ours = tmp_path / "ours.pbf"
    write_pbf(ours, mat, shift=4)
    got = ours.read_bytes()
    ref = res.stdout
    assert len(got) == len(ref)
    # pbfview writes to stdout where ftell() fails, so the reference's footer
    # S-offset index and trailing footer-offset hold -1; the body (all S and
    # B records) and footer row counts must still match byte-for-byte.
    import struct
    # locate footer: last 8 bytes of OUR file give its offset
    foot = struct.unpack_from("<Q", got, len(got) - 8)[0]
    body_end = foot + 1 + 8 + 4  # 'I' + n_rows + n_idx
    assert got[:body_end] == ref[:body_end]


def test_pbf_read_reference_file(tmp_path, ref_pbfview):
    """We must decode reference-written PBF files."""
    rng = np.random.default_rng(3)
    mat = rand_matrix(rng, 60, 19)
    pim = to_pim(mat)
    refpbf = tmp_path / "ref.pbf"
    res = subprocess.run(
        [ref_pbfview, "-S", "-b", "-s", "3", "-"],
        input=pim.encode(), capture_output=True, check=True,
    )
    refpbf.write_bytes(res.stdout)
    out = read_pbf(refpbf)
    assert np.array_equal(out, mat)


def test_pbf_seek_and_subset(tmp_path, ref_pbfview):
    rng = np.random.default_rng(4)
    n_rows, m = 200, 41
    mat = rand_matrix(rng, n_rows, m)
    p = tmp_path / "t.pbf"
    write_pbf(p, mat, shift=4)

    for start in [0, 1, 15, 16, 17, 63, 150, 199]:
        out = read_pbf(p, start=start, n=5)
        assert np.array_equal(out, mat[start:start + 5]), f"seek {start}"

    cols = [0, 7, 40, 3, 3, 19]
    out = read_pbf(p, sub=cols)
    assert np.array_equal(out, mat[:, cols])

    # subset + seek, compare against reference pbfview output
    args = [ref_pbfview] + sum((["-c", str(c)] for c in cols), []) + ["-r", "37", str(p)]
    res = subprocess.run(args, capture_output=True, check=True)
    ref_rows = [
        [int(x) for x in line.split()]
        for line in res.stdout.decode().splitlines()[1:]
    ]
    out = read_pbf(p, sub=cols, start=37)
    assert np.array_equal(out, np.array(ref_rows, dtype=np.uint8))


def test_pbf_seek_backwards_and_random(tmp_path):
    rng = np.random.default_rng(5)
    n_rows, m = 300, 23
    mat = rand_matrix(rng, n_rows, m)
    p = tmp_path / "t.pbf"
    write_pbf(p, mat, shift=5)
    r = pbf.PbfReader(str(p))
    for row in [250, 3, 100, 99, 299, 0, 32, 31]:
        assert r.seek(row) == 0
        planes = r.read_row()
        got = planes[0] | (planes[1] << 1)
        assert np.array_equal(got, mat[row]), f"row {row}"
    r.close()


def test_pbf_subset_with_seek_oracle(tmp_path, ref_pbfview):
    """Subset decode across checkpoint-seeks must match the reference."""
    rng = np.random.default_rng(6)
    n_rows, m = 128, 64
    mat = rand_matrix(rng, n_rows, m)
    p = tmp_path / "t.pbf"
    write_pbf(p, mat, shift=3)
    cols = [5, 0, 63, 33, 12]
    for start in [0, 7, 8, 9, 64, 127]:
        args = [ref_pbfview] + sum((["-c", str(c)] for c in cols), []) + [
            "-r", str(start), "-n", "4", str(p)]
        res = subprocess.run(args, capture_output=True, check=True)
        ref_rows = [
            [int(x) for x in line.split()]
            for line in res.stdout.decode().splitlines()[1:]
        ]
        r = pbf.PbfReader(str(p))
        r.seek(start)
        r.subset(cols)
        rows = []
        for _ in range(4):
            planes = r.read_row()
            if planes is None:
                break
            rows.append(planes[0] | (planes[1] << 1))
        r.close()
        assert np.array_equal(np.array(rows), np.array(ref_rows)), f"start {start}"
