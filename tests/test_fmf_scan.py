"""Vectorized FMF scan parity: fast columnar path vs scalar loop vs the
reference `bgt fmf` CLI (reference fmf.c:185-227, tex/bgt.tex:214-217)."""

import gzip
import io
import random
import subprocess

import pytest

from bgt_tpu import cli, native
from bgt_tpu.core import kexpr
from bgt_tpu.formats import fmf

# without the native scanner the fast path (correctly) reports itself
# inapplicable and the per-row loop serves every query — covered by the
# annotation-join parity tests, which run in both modes
pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def scalar_names(fn, expr, name_only=True):
    ke, err = kexpr.parse(expr)
    assert err == 0
    fs = fmf.FmfStream(fn)
    out = []
    while True:
        s = fs.read(ke, name_only)
        if s is None:
            break
        out.append(s)
    fs.close()
    return out


def fast_names(fn, expr, name_only=True):
    ke, err = kexpr.parse(expr)
    assert err == 0
    return fmf.scan_filter(fn, ke, name_only)


@pytest.fixture(scope="module")
def fmf_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fmfscan")
    rng = random.Random(5)
    imp = ["HIGH", "LOW", "MODERATE", "MODIFIER", "x" * 40]
    genes = [f"G{i}" for i in range(60)]  # >24 uniques: exercises hash tier
    lines = []
    for i in range(4000):
        parts = [f"11:{1000 + i}:1:A"]
        if rng.random() < 0.9:
            parts.append(f"impact:Z:{rng.choice(imp)}")
        if rng.random() < 0.8:
            parts.append(f"csq:i:{rng.randrange(-5, 50)}")
        if rng.random() < 0.5:
            parts.append(f"af:f:{rng.random():.4f}")
        if rng.random() < 0.3:
            parts.append("flagonly")
        if rng.random() < 0.2:
            parts.append(f"gene:Z:{rng.choice(genes)}")
        if rng.random() < 0.05:
            parts.append("csq:i:0x1f")  # strtol base-0 hex, last-wins
        lines.append("\t".join(parts))
    (tmp / "a.fmf").write_text("\n".join(lines) + "\n")
    with gzip.open(tmp / "a.fmf.gz", "wt") as fp:
        fp.write("\n".join(lines) + "\n")
    return tmp


EXPRS = [
    'impact=="HIGH"',
    'impact!="LOW"&&csq>10',
    'impact=="HIGH"||csq<0',
    "af>0.5",
    "csq>=0x10",
    'gene=="G7"',
    'impact<"M"',
    '"HIGH"==impact',
    "csq%7==3",
    "csq*2-1>40&&af<0.9",
]


@pytest.mark.parametrize("expr", EXPRS)
def test_fast_matches_scalar(fmf_file, expr):
    fn = str(fmf_file / "a.fmf")
    fast = fast_names(fn, expr)
    assert fast is not None, f"fast path unexpectedly inapplicable: {expr}"
    assert fast == scalar_names(fn, expr)


@pytest.mark.parametrize("expr", EXPRS[:4])
def test_fast_matches_scalar_gzip(fmf_file, expr):
    fn = str(fmf_file / "a.fmf.gz")
    fast = fast_names(fn, expr)
    assert fast is not None
    assert fast == scalar_names(fn, expr)


def test_full_line_mode(fmf_file):
    for fn in (str(fmf_file / "a.fmf"), str(fmf_file / "a.fmf.gz")):
        fast = fast_names(fn, 'impact=="HIGH"&&csq>20', name_only=False)
        assert fast is not None
        assert fast == scalar_names(fn, 'impact=="HIGH"&&csq>20',
                                    name_only=False)


def test_fallbacks(fmf_file, tmp_path):
    fn = str(fmf_file / "a.fmf")
    # _ROW_ forces the scalar path
    ke, _ = kexpr.parse('_ROW_=="11:1000:1:A"')
    assert fmf.scan_filter(fn, ke, True) is None
    # functions are unbound in scans: every row fails in both paths
    assert fast_names(fn, "sqrt(csq)>2") == []
    assert scalar_names(fn, "sqrt(csq)>2") == []
    # mixed string/numeric column falls back
    (tmp_path / "mix.fmf").write_text(
        "r1\tk:i:5\nr2\tk:Z:high\nr3\tk:i:9\n")
    ke, _ = kexpr.parse("k>3")
    assert fmf.scan_filter(str(tmp_path / "mix.fmf"), ke, True) is None
    # never-present key: no rows pass either way
    assert fast_names(fn, "nosuchkey>0") == []
    assert scalar_names(fn, "nosuchkey>0") == []


def test_token_quirks(tmp_path):
    """'k:i5' is typed with an empty value (strtol("")=0); bare 'k:' and
    'k:i' are flags; last occurrence wins (fmf.c token rules)."""
    fn = str(tmp_path / "q.fmf")
    (tmp_path / "q.fmf").write_text(
        "r1\tk:i5\nr2\tk:\nr3\tk:i\nr4\tk:i:7\tk:i:9\nr5\tk:f:2.5\n")
    for expr in ("k==0", "k>8", "k>2"):
        assert fast_names(fn, expr) == scalar_names(fn, expr), expr


def test_cli_parity_vs_reference(fmf_file, ref_bgt):
    fn = str(fmf_file / "a.fmf")
    for args in (["-n", fn, 'impact=="HIGH"&&csq>10'],
                 [fn, 'gene=="G7"||af>0.95'],
                 ["-n", fn, 'impact<"M"']):
        ref = subprocess.run([ref_bgt, "fmf"] + args, capture_output=True)
        assert ref.returncode == 0
        buf = io.StringIO()
        assert cli.main_fmf(args, out=buf) == 0
        assert buf.getvalue() == ref.stdout.decode(), args


def test_sidecar_cache(fmf_file, monkeypatch):
    """Repeat scans are served from the .fmfidx sidecar without touching
    the file; the sidecar accumulates columns and invalidates on mtime."""
    import os
    fmf_file = str(fmf_file / "a.fmf")
    side = fmf_file + ".fmfidx"
    if os.path.exists(side):
        os.unlink(side)
    want = fast_names(fmf_file, 'csq > 10')
    assert os.path.exists(side)
    # cached repeat: the native scanner must not be called at all
    def boom(*a, **k):
        raise AssertionError("native scan called on a cached query")
    monkeypatch.setattr(native, "fmf_scan_columns", boom)
    assert fast_names(fmf_file, 'csq > 10') == want
    assert fast_names(fmf_file, 'csq > 40') == scalar_names(fmf_file, 'csq > 40')
    monkeypatch.undo()
    # new key -> merge scan, sidecar now covers both
    want2 = fast_names(fmf_file, 'impact == "HIGH" && csq > 0')
    assert want2 == scalar_names(fmf_file, 'impact == "HIGH" && csq > 0')
    monkeypatch.setattr(native, "fmf_scan_columns", boom)
    assert fast_names(fmf_file, 'impact == "HIGH" && csq > 0') == want2
    monkeypatch.undo()
    # invalidation: touching the file forces a rescan
    os.utime(fmf_file, ns=(os.stat(fmf_file).st_atime_ns,
                           os.stat(fmf_file).st_mtime_ns + 1))
    called = []
    real = fmf.scan_filter
    orig = native.fmf_scan_columns
    def spy(fn, keys):
        called.append(keys)
        return orig(fn, keys)
    monkeypatch.setattr(native, "fmf_scan_columns", spy)
    assert fast_names(fmf_file, 'csq > 10') == want
    assert called, "stale sidecar was trusted after mtime change"


def test_sidecar_cache_disabled(fmf_file, monkeypatch):
    fmf_file = str(fmf_file / "a.fmf")
    monkeypatch.setenv("BGT_TPU_FMF_CACHE", "0")
    assert fast_names(fmf_file, 'af < 0.25') == scalar_names(fmf_file, 'af < 0.25')
