"""BGZF I/O behaviors not covered by the end-to-end parity suites."""

import numpy as np

from bgt_tpu.io.bgzf import BgzfReader, BgzfWriter


def test_bgzf_mt_writer_identical(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, 3_000_000, dtype=np.uint8).tobytes()
    with BgzfWriter(tmp_path / "a.bgz") as w:
        for i in range(0, len(data), 9973):
            w.write(data[i:i + 9973])
    with BgzfWriter(tmp_path / "b.bgz", threads=4) as w:
        for i in range(0, len(data), 9973):
            w.write(data[i:i + 9973])
    assert (tmp_path / "a.bgz").read_bytes() == (tmp_path / "b.bgz").read_bytes()
    with BgzfReader(tmp_path / "b.bgz") as r:
        assert r.read(len(data) + 10) == data


def test_bgzf_virtual_offsets(tmp_path):
    payload = b"".join(bytes([i % 251]) * 997 for i in range(300))
    offs = []
    with BgzfWriter(tmp_path / "c.bgz") as w:
        pos = 0
        for i in range(300):
            offs.append(w.tell())
            w.write(payload[pos:pos + 997])
            pos += 997
    r = BgzfReader(tmp_path / "c.bgz")
    for i in [0, 5, 299, 100, 66, 1]:
        r.seek(offs[i])
        assert r.read(997) == payload[i * 997:(i + 1) * 997], i
    r.close()


def test_csi_push_batch_matches_scalar_push():
    """The vectorized batch CSI builder must reproduce the per-record push
    state machine exactly (bins, chunks, meta, linear index, loff, RNI)."""
    import numpy as np
    from bgt_tpu.formats.csi import HtsIndex

    rng = np.random.default_rng(3)
    for trial in range(4):
        n = int(rng.integers(1, 3000))
        n_ctg = int(rng.integers(1, 4))
        tid = np.sort(rng.integers(0, n_ctg, n))
        pos = np.empty(n, np.int64)
        for t in range(n_ctg):
            m = tid == t
            pos[m] = np.sort(rng.integers(0, 5_000_000, m.sum()))
        rlen = rng.choice([1, 2, 5, 30000], n, p=[0.8, 0.1, 0.08, 0.02])
        end = pos + rlen
        voff = np.cumsum(rng.integers(20, 4000, n)).astype(np.uint64) \
            + (7 << 16)
        off0 = 7 << 16
        a = HtsIndex(n_ctg, 14, 5, offset0=off0)
        for i in range(n):
            a.push(int(tid[i]), int(pos[i]), int(end[i]), int(voff[i]), True)
        a.finish(int(voff[-1]) + (99 << 16))
        b = HtsIndex(n_ctg, 14, 5, offset0=off0)
        b.push_batch(tid, pos, end, voff)
        b.finish(int(voff[-1]) + (99 << 16))
        assert a.n_rec == b.n_rec and a.ridx == b.ridx
        assert a.n == b.n
        for i in range(a.n):
            assert a.bidx[i] == b.bidx[i], (trial, i)
            assert a.loff[i] == b.loff[i]
            assert a.lidx[i] == b.lidx[i]


def test_bgzf_writer_flush_then_write():
    """A mid-stream flush must not lose later writes (the native pipeline's
    worker exits at flush; late data compresses synchronously)."""
    import io
    import numpy as np
    from bgt_tpu.io.bgzf import BLOCK_SIZE, BgzfReader, BgzfWriter

    rng = np.random.default_rng(1)
    d1 = rng.integers(0, 8, 3 * BLOCK_SIZE + 777, dtype=np.uint8).tobytes()
    d2 = rng.integers(0, 8, 2 * BLOCK_SIZE + 33, dtype=np.uint8).tobytes()
    buf = io.BytesIO()
    w = BgzfWriter(buf, level=1, threads=4)
    w.write(d1)
    w.flush()
    w.write(d2)
    w.close()
    buf.seek(0)
    assert BgzfReader(buf).read(len(d1) + len(d2) + 10) == d1 + d2


def test_khash_layout_fuzz_vs_reference():
    """_KhashLayout (the .csi bin-order simulator) matches the reference
    khash.h bucket-iteration order on randomized put sequences, including
    heavy duplication (duplicate puts drive resize timing, the bug class
    the r5 soak caught) and bin-like key distributions."""
    import random
    import subprocess
    from pathlib import Path

    from bgt_tpu.formats.csi import _KhashLayout

    repo = Path(__file__).resolve().parent.parent
    exe = repo / "build" / "ref" / "khash_oracle"
    if not exe.exists():
        subprocess.run(
            ["gcc", "-O2", "-I", "/root/reference",
             "-o", str(exe), str(repo / "tools" / "khash_oracle.c")],
            check=True)
    rng = random.Random(42)
    for trial in range(120):
        n = rng.randint(0, 400)
        style = trial % 3
        seq = []
        for _ in range(n):
            if style == 0:      # bin-like: clustered level-5 bins + pseudo
                key = rng.choice([4681 + rng.randint(0, 60), 37450,
                                  585 + rng.randint(0, 8), 0])
            elif style == 1:    # heavy duplication from a tiny pool
                key = rng.choice([1, 2, 3, 0xFFFFFFFF, 7777])
            else:               # uniform 32-bit
                key = rng.getrandbits(32)
            seq.append(key)
        want = subprocess.run(
            [str(exe)], input="".join(f"{k}\n" for k in seq),
            capture_output=True, text=True, check=True).stdout.split()
        kh = _KhashLayout()
        for k in seq:
            kh.put(k)
        got = [str(k) for k in kh.order()]
        assert got == want, (trial, len(seq), seq[:20])
