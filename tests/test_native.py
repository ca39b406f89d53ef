"""Native C++ host codec: byte equivalence with the numpy implementations."""

import numpy as np
import pytest

from bgt_tpu import native
from bgt_tpu.formats.pbf import PbfWriter
from bgt_tpu.ops.tiles import TileStore


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def test_native_pbf_writer_bytes(tmp_path, lib):
    rng = np.random.default_rng(0)
    codes = rng.choice(4, size=(300, 77), p=[0.6, 0.25, 0.1, 0.05]).astype(np.uint8)
    py = PbfWriter(str(tmp_path / "py.pbf"), 77, 2, 4)
    for row in codes:
        py.write_row([row & 1, row >> 1])
    py.close()
    nw = native.NativePbfWriter(str(tmp_path / "c.pbf"), 77, 2, 4)
    nw.write_codes(codes)
    nw.close()
    assert (tmp_path / "c.pbf").read_bytes() == (tmp_path / "py.pbf").read_bytes()


def test_native_gtc(tmp_path, lib):
    rng = np.random.default_rng(1)
    codes = rng.choice(4, size=(200, 150)).astype(np.uint8)
    py = PbfWriter(str(tmp_path / "t.pbf"), 150, 2, 5)
    for row in codes:
        py.write_row([row & 1, row >> 1])
    py.close()
    n = native.gtc_from_pbf(str(tmp_path / "t.pbf"), str(tmp_path / "t.gtc"))
    assert n == 200
    ts = TileStore.load(str(tmp_path / "t.gtc"))
    assert np.array_equal(ts.codes(np.arange(200)), codes)
    # identical to the numpy-built tile file
    ts2 = TileStore.from_pbf(str(tmp_path / "t.pbf"))
    assert np.array_equal(ts.plane0, ts2.plane0)
    assert np.array_equal(ts.plane1, ts2.plane1)


def test_native_large_runs(tmp_path, lib):
    """Rows with runs >= 16 exercise the multi-nibble RLE encoding."""
    codes = np.zeros((40, 5000), dtype=np.uint8)
    codes[5, :] = 1
    codes[7, 100:4000] = 1
    codes[9, ::2] = 3
    codes[11, :17] = 2
    nw = native.NativePbfWriter(str(tmp_path / "c.pbf"), 5000, 2, 13)
    nw.write_codes(codes)
    nw.close()
    py = PbfWriter(str(tmp_path / "py.pbf"), 5000, 2, 13)
    for row in codes:
        py.write_row([row & 1, row >> 1])
    py.close()
    assert (tmp_path / "c.pbf").read_bytes() == (tmp_path / "py.pbf").read_bytes()
    n = native.gtc_from_pbf(str(tmp_path / "c.pbf"), str(tmp_path / "c.gtc"))
    ts = TileStore.load(str(tmp_path / "c.gtc"))
    assert np.array_equal(ts.codes(np.arange(40)), codes)
