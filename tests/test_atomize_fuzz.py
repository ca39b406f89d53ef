"""Adversarial atomizer fuzz: nasty overlapping/complex records vs the
reference `bgt atomize` binary (reference atomic.c; SURVEY singles the
atomizer out as the easiest host logic to get subtly wrong)."""

import io
import random
import subprocess

import pytest

from bgt_tpu import cli

BASES = "ACGT"


def _seq(rng, lo, hi):
    return "".join(rng.choice(BASES) for _ in range(rng.randrange(lo, hi)))


def _nasty_vcf(seed: int, n_sites: int = 120, n_samples: int = 6) -> str:
    """Dense, overlapping, multi-allelic records with shared prefixes and
    suffixes, MNP-like blocks, spanning deletions and duplicate atoms."""
    rng = random.Random(seed)
    samples = [f"S{i}" for i in range(n_samples)]
    lines = [
        "##fileformat=VCFv4.1",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "##contig=<ID=1,length=100000>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(samples),
    ]
    pos = 100
    for _ in range(n_sites):
        # densely packed: frequent overlap with the previous record
        pos += rng.randrange(0, 6)
        ref = _seq(rng, 1, 8)
        alts = []
        n_alt = rng.randrange(1, 4)
        for _ in range(n_alt):
            kind = rng.randrange(5)
            if kind == 0:  # SNP-in-place: same length, share a prefix
                alt = list(ref)
                alt[rng.randrange(len(ref))] = rng.choice(BASES)
                alt = "".join(alt)
            elif kind == 1:  # insertion sharing ref prefix
                cut = rng.randrange(len(ref) + 1)
                alt = ref[:cut] + _seq(rng, 1, 5) + ref[cut:]
            elif kind == 2:  # deletion keeping shared ends
                if len(ref) > 1:
                    a, b = sorted(rng.sample(range(len(ref) + 1), 2))
                    alt = ref[:a] + ref[b:]
                    if not alt:
                        alt = ref[0]
                else:
                    alt = ref + _seq(rng, 1, 3)
            elif kind == 3:  # complex replacement
                alt = _seq(rng, 1, 8)
            else:  # duplicate-prone: ref itself with one trailing change
                alt = ref[:-1] + rng.choice(BASES) if len(ref) > 1 \
                    else rng.choice(BASES)
            if alt != ref and alt not in alts:
                alts.append(alt)
        if not alts:
            alts = [("A" if ref[0] != "A" else "C") + ref[1:]]
        gts = []
        for _ in range(n_samples):
            def one():
                if rng.random() < 0.05:
                    return "."
                return str(rng.randrange(0, len(alts) + 1))
            sep = "|" if rng.random() < 0.7 else "/"
            gts.append(one() + sep + one())
        lines.append(f"1\t{pos}\t.\t{ref}\t{','.join(alts)}\t100\tPASS\t.\tGT\t"
                     + "\t".join(gts))
        pos += rng.randrange(0, max(2, len(ref)))
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("mode", [[], ["-M"], ["-0"], ["-M", "-0"]])
def test_atomize_fuzz_parity(tmp_path, ref_bgt, seed, mode):
    vcf = _nasty_vcf(seed)
    fn = tmp_path / f"n{seed}.vcf"
    fn.write_text(vcf)
    ref = subprocess.run([ref_bgt, "atomize", "-S"] + mode + [str(fn)],
                         capture_output=True)
    assert ref.returncode == 0, ref.stderr.decode()
    buf = io.StringIO()
    rc = cli.main_atomize(["-S"] + mode + [str(fn)], out=buf)
    assert rc == 0
    assert buf.getvalue() == ref.stdout.decode(), f"seed {seed} mode {mode}"


@pytest.mark.parametrize("seed", range(4))
def test_import_view_roundtrip_nasty(tmp_path, ref_bgt, seed):
    """Full import + dump parity on the adversarial cohorts."""
    from bgt_tpu.query import importer
    from bgt_tpu.query.view import main_view
    vcf = _nasty_vcf(seed + 100, n_sites=80)
    (tmp_path / "in.vcf").write_text(vcf)
    res = subprocess.run([ref_bgt, "import", "-S", "refdb", "in.vcf"],
                         cwd=tmp_path, capture_output=True)
    assert res.returncode == 0, res.stderr.decode()
    importer.import_vcf(str(tmp_path / "ourdb"), [str(tmp_path / "in.vcf")],
                        is_vcf=True)
    assert (tmp_path / "ourdb.bcf").read_bytes() == \
        (tmp_path / "refdb.bcf").read_bytes()
    assert (tmp_path / "ourdb.pbf").read_bytes() == \
        (tmp_path / "refdb.pbf").read_bytes()
    ref = subprocess.run([ref_bgt, "view", "-C", "refdb"], cwd=tmp_path,
                         capture_output=True)
    buf = io.StringIO()
    import os
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main_view(["-C", "ourdb"], out=buf) == 0
    finally:
        os.chdir(old)
    assert buf.getvalue() == ref.stdout.decode()
