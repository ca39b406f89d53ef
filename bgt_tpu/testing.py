"""Synthetic VCF generation for parity tests and benchmarks.

The canonical bgt demo data (1kg chr11:1-1M) cannot be downloaded in this
environment, so tests generate random cohort VCFs with the same structural
features (multi-allelics, indels, missing genotypes, phased diploid GT) and
compare our pipeline byte-for-byte against the reference binary built from
/root/reference.
"""

from __future__ import annotations

import numpy as np

BASES = "ACGT"


def random_vcf(
    n_samples: int = 20,
    n_sites: int = 100,
    seed: int = 0,
    chroms=("11",),
    chrom_len: int = 135006516,
    p_multi: float = 0.15,
    p_indel: float = 0.2,
    p_missing: float = 0.03,
    phased: bool = True,
    with_filter: bool = False,
    sample_prefix: str = "S",
) -> str:
    rng = np.random.default_rng(seed)
    samples = [f"{sample_prefix}{i:04d}" for i in range(n_samples)]
    lines = [
        "##fileformat=VCFv4.1",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
    ]
    if with_filter:
        lines.append('##FILTER=<ID=q10,Description="Quality below 10">')
    for c in chroms:
        lines.append(f"##contig=<ID={c},length={chrom_len}>")
    lines.append("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(samples))

    sep = "|" if phased else "/"
    for c in chroms:
        pos = 10000
        for _ in range(n_sites):
            pos += int(rng.integers(1, 2000))
            ref_len = 1
            is_indel = rng.random() < p_indel
            if is_indel:
                ref_len = int(rng.integers(1, 6))
            ref = "".join(BASES[i] for i in rng.integers(0, 4, ref_len))
            n_alt = 1
            if rng.random() < p_multi:
                n_alt = int(rng.integers(2, 4))
            alts = []
            tries = 0
            while len(alts) < n_alt and tries < 20:
                tries += 1
                kind = rng.random()
                if not is_indel and kind < 0.7:  # SNP on first base
                    a = BASES[int(rng.integers(0, 4))]
                    if a != ref[0] and len(ref) == 1 and a not in alts:
                        alts.append(a)
                elif kind < 0.85:  # insertion
                    ins = "".join(BASES[i] for i in rng.integers(0, 4, rng.integers(1, 4)))
                    a = ref[0] + ins + ref[1:]
                    if a != ref and a not in alts:
                        alts.append(a)
                else:  # deletion / complex
                    keep = int(rng.integers(0, max(1, ref_len)))
                    a = ref[0] + ref[ref_len - keep:] if keep else ref[0]
                    if a != ref and a not in alts:
                        alts.append(a)
            if not alts:
                alts = [ref[0] + "T"]
            n_allele = len(alts) + 1
            # vectorized GT cell assembly: (n_samples, 4) bytes "a|b\t"
            a1 = rng.integers(0, n_allele, n_samples).astype(np.uint8) + ord("0")
            a2 = rng.integers(0, n_allele, n_samples).astype(np.uint8) + ord("0")
            a1[rng.random(n_samples) < p_missing] = ord(".")
            a2[rng.random(n_samples) < p_missing] = ord(".")
            cells = np.empty((n_samples, 4), dtype=np.uint8)
            cells[:, 0] = a1
            cells[:, 1] = ord(sep)
            cells[:, 2] = a2
            cells[:, 3] = ord("\t")
            gt_str = cells.tobytes()[:-1].decode("latin-1")
            qual = "%g" % float(np.round(rng.random() * 200, 1))
            flt = "PASS"
            if with_filter and rng.random() < 0.1:
                flt = "q10"
            lines.append(
                f"{c}\t{pos}\t.\t{ref}\t{','.join(alts)}\t{qual}\t{flt}\t.\tGT\t"
                + gt_str
            )
    return "\n".join(lines) + "\n"


def random_spl(n_samples: int, seed: int = 0, sample_prefix: str = "S",
               populations=("CEU", "YRI", "CHB", "TSI")) -> str:
    """Sample metadata in FMF with population and gender keys."""
    rng = np.random.default_rng(seed + 1)
    lines = []
    for i in range(n_samples):
        pop = populations[int(rng.integers(0, len(populations)))]
        gender = "M" if rng.random() < 0.5 else "F"
        lines.append(f"{sample_prefix}{i:04d}\tpopulation:Z:{pop}\tgender:Z:{gender}")
    return "\n".join(lines) + "\n"
