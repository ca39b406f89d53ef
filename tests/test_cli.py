"""CLI tool parity: pbfview, kexpr, bcfidx, BCF output modes."""

import io
import os
import subprocess

import numpy as np
import pytest

from bgt_tpu import testing
from bgt_tpu.cli import main_kexpr, main_pbfview
from bgt_tpu.query import importer


def run_ours_view(args, cwd, dbname="ourdb"):
    from bgt_tpu.query.view import main_view
    buf = io.StringIO()
    old = os.getcwd()
    os.chdir(cwd)
    try:
        ret = main_view(args + [dbname], out=buf)
    finally:
        os.chdir(old)
    assert ret == 0
    return buf.getvalue()


def test_pbfview_parity(tmp_path, ref_pbfview):
    rng = np.random.default_rng(0)
    mat = (rng.random((100, 17)) * 4).astype(np.uint64)
    pim = "PIM1 17 2\n" + "\n".join(
        " ".join(str(int(x)) for x in row) for row in mat) + "\n"
    (tmp_path / "t.pim").write_text(pim)
    # PIM -> PBF parity
    ref = subprocess.run([ref_pbfview, "-S", "-b", "-s", "4", str(tmp_path / "t.pim")],
                         capture_output=True, check=True)
    buf = io.BytesIO()

    class W:
        buffer = buf

        def write(self, s):
            buf.write(s.encode())

    ret = main_pbfview(["-S", "-b", "-s", "4", str(tmp_path / "t.pim")], out=W())
    assert ret == 0
    assert buf.getvalue() == ref.stdout
    # write a real PBF and view subsets both ways
    (tmp_path / "t.pbf").write_bytes(ref.stdout)
    for args in (["-r", "7", "-n", "5"], ["-c", "3", "-c", "0", "-c", "16"]):
        ref2 = subprocess.run([ref_pbfview] + args + [str(tmp_path / "t.pbf")],
                              capture_output=True, check=True)
        sbuf = io.StringIO()
        ret = main_pbfview(args + [str(tmp_path / "t.pbf")], out=sbuf)
        assert ret == 0
        assert sbuf.getvalue() == ref2.stdout.decode()


def test_kexpr_cli(ref_kexpr):
    for args in (["1+2*3"], ["AC/AN>0.1", "AC=5", "AN=20"], ["-p", "1+2*3"]):
        ref = subprocess.run([ref_kexpr] + args, capture_output=True, check=True,
                             text=True)
        buf = io.StringIO()
        assert main_kexpr(args, out=buf) == 0
        assert buf.getvalue() == ref.stdout


def test_view_bcf_output_parity(tmp_path, ref_bgt):
    """-b/-u BCF outputs must be byte-identical (incl. the clevel quirk)."""
    vcf = testing.random_vcf(n_samples=10, n_sites=60, seed=31)
    (tmp_path / "in.vcf").write_text(vcf)
    subprocess.run([ref_bgt, "import", "-S", "refdb", "in.vcf"], cwd=tmp_path,
                   capture_output=True, check=True)
    importer.import_vcf(str(tmp_path / "ourdb"), [str(tmp_path / "in.vcf")],
                        is_vcf=True)
    for args in (["-b"], ["-u"], ["-b", "-l", "5"], ["-b", "-C"]):
        ref = subprocess.run([ref_bgt, "view"] + args + ["refdb"], cwd=tmp_path,
                             capture_output=True, check=True)
        from bgt_tpu.query.view import main_view
        buf = io.BytesIO()

        class W:
            buffer = buf

        old = os.getcwd()
        os.chdir(tmp_path)
        try:
            ret = main_view(args + ["ourdb"], out=W())
        finally:
            os.chdir(old)
        assert ret == 0
        assert buf.getvalue() == ref.stdout, f"args {args}"


def test_bcfidx_roundtrip(tmp_path, ref_bgt):
    """Re-indexing a BCF with our bcfidx must keep the reference happy."""
    vcf = testing.random_vcf(n_samples=6, n_sites=40, seed=33)
    (tmp_path / "in.vcf").write_text(vcf)
    importer.import_vcf(str(tmp_path / "db"), [str(tmp_path / "in.vcf")], is_vcf=True)
    before = subprocess.run([ref_bgt, "view", "-C", "db"], cwd=tmp_path,
                            capture_output=True, check=True).stdout
    os.unlink(tmp_path / "db.bcf.csi")
    from bgt_tpu.cli import main_bcfidx
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main_bcfidx(["db.bcf"]) == 0
    finally:
        os.chdir(old)
    after = subprocess.run([ref_bgt, "view", "-C", "db"], cwd=tmp_path,
                           capture_output=True, check=True).stdout
    assert before == after


def test_misc_converters():
    from bgt_tpu.misc.pop2region import POP2REGION
    assert POP2REGION["CEU"] == "WestEurasia"
    from bgt_tpu.misc.vep2sql import reg2bin
    assert reg2bin(0, 1) == ((1 << 15) - 1) // 7


def test_gtcshard_cli(tmp_path):
    import io
    import numpy as np
    from bgt_tpu import cli, testing
    from bgt_tpu.query import importer
    from bgt_tpu.ops.tiles import TileStore
    vcf = testing.random_vcf(n_samples=40, n_sites=60, seed=51)
    (tmp_path / "in.vcf").write_text(vcf)
    importer.import_vcf(str(tmp_path / "db"), [str(tmp_path / "in.vcf")],
                        is_vcf=True)
    buf = io.StringIO()
    rc = cli.main_gtcshard([str(tmp_path / "db"), "2", "8"], out=buf)
    assert rc == 0
    paths = buf.getvalue().splitlines()
    assert len(paths) == 2
    full = TileStore.open_or_build(str(tmp_path / "db"))
    off = 0
    for p in paths:
        sh = TileStore.load(p)
        assert sh.is_shard and sh.word_offset == off
        assert np.array_equal(
            sh.plane0, full.plane0[:, off: off + sh.plane0.shape[1]])
        off += sh.plane0.shape[1]
