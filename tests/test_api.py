"""Programmatic API: results consistent with the CLI output."""

import numpy as np
import pytest

import bgt_tpu
from bgt_tpu import testing
from bgt_tpu.query import importer


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("apidb")
    vcf = testing.random_vcf(n_samples=14, n_sites=120, seed=91)
    (tmp / "in.vcf").write_text(vcf)
    importer.import_vcf(str(tmp / "db"), [str(tmp / "in.vcf")], is_vcf=True)
    (tmp / "db.spl").write_text(testing.random_spl(14, seed=91))
    return bgt_tpu.open(str(tmp / "db")), tmp


def test_basic_counts(ds):
    d, tmp = ds
    assert len(d.samples) == 14
    res = d.query(genotypes=True)
    assert res.n_sites == d.n_sites
    gt = res.genotypes()
    assert gt.shape == (res.n_sites, 14, 2)
    # AN/AC recomputed from the genotype matrix must agree
    an = (gt != 2).sum(axis=(1, 2)) - (gt == 3).sum(axis=(1, 2)) \
        + (gt == 3).sum(axis=(1, 2))
    an2 = ((gt == 0) | (gt == 1) | (gt == 3)).sum(axis=(1, 2))
    assert np.array_equal(res.an, an2)
    assert np.array_equal(res.ac, (gt == 1).sum(axis=(1, 2)))
    assert np.array_equal(res.ac_m, (gt == 3).sum(axis=(1, 2)))


def test_region_and_filter(ds):
    d, tmp = ds
    res = d.query(region="11:100000-300000", site_filter="AC>0")
    assert (res.ac > 0).all()
    assert ((res.pos + res.rlen > 100000 - 1) & (res.pos < 300000)).all()


def test_groups(ds):
    d, tmp = ds
    res = d.query(samples=['population=="CEU"', 'population=="YRI"'],
                  site_filter="AN1>0")
    assert res.group_an is not None and res.group_an.shape[1] == 2
    assert np.array_equal(res.group_ac.sum(axis=1), res.ac)


def test_allele_frequency(ds):
    d, tmp = ds
    res = d.query()
    af = res.allele_frequency()
    assert af.shape == (res.n_sites,)
    assert np.nanmax(af) <= 1.0


def test_limit(ds):
    d, tmp = ds
    res = d.query(limit=7)
    assert res.n_sites == 7
