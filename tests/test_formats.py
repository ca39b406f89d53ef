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
