#!/usr/bin/env python
"""Randomized end-to-end parity soak vs the reference binary.

Each iteration: generate a random cohort VCF (random shape, multi-allelic/
indel/missing/filter/phasing mix, optionally gzipped), import with both
engines (byte-compare all artifacts), then run a random set of view
queries (regions, subsets, groups, filters, allele sets, -S/-H, tables,
-b, paging) and byte-compare the outputs.

    python tools/soak_parity.py [seconds] [seed]

Any divergence prints a full repro (seed + args) and exits 1.
"""

import hashlib
import io
import os
import random
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bgt_tpu import testing  # noqa: E402
from bgt_tpu.query import importer  # noqa: E402
from bgt_tpu.query.view import main_view  # noqa: E402

REF = REPO / "build" / "ref" / "bgt"


def ours(args, cwd):
    buf = io.StringIO()
    old = os.getcwd()
    os.chdir(cwd)
    try:
        ret = main_view(args + ["ourdb"], out=buf)
    finally:
        os.chdir(old)
    return ret, buf.getvalue()


def ours_binary(args, cwd):
    import contextlib
    h = hashlib.md5()

    class Sink(io.TextIOBase):
        def __init__(self):
            outer_h = h

            class B:
                def write(b, data):
                    outer_h.update(data)
                    return len(data)

                def flush(b):
                    pass

            self.buffer = B()

        def write(self, s):
            h.update(s.encode("latin-1"))
            return len(s)

    old = os.getcwd()
    os.chdir(cwd)
    try:
        ret = main_view(args + ["ourdb"], out=Sink())
    finally:
        os.chdir(old)
    return ret, h.hexdigest()


def multi_db_iter(rng, seed, tmp: Path) -> None:
    """2-3 databases with distinct cohorts, queried jointly (the bgtm
    union-merge path, now a native k-way streaming merge)."""
    n_db = rng.randint(2, 3)
    names = []
    for d in range(n_db):
        n_samples = rng.randint(1, 40)
        vcf = testing.random_vcf(
            n_samples=n_samples, n_sites=rng.randint(20, 300),
            seed=seed * 7 + d, p_multi=rng.choice([0.0, 0.4]),
            p_indel=rng.choice([0.0, 0.3]),
            p_missing=rng.choice([0.0, 0.1]),
            sample_prefix=f"D{d}S")
        (tmp / f"in{d}.vcf").write_text(vcf)
        res = subprocess.run([str(REF), "import", "-S", f"ref{d}",
                              f"in{d}.vcf"], cwd=tmp, capture_output=True)
        if res.returncode != 0:
            return
        importer.import_vcf(str(tmp / f"our{d}"),
                            [str(tmp / f"in{d}.vcf")], is_vcf=True)
        names.append(d)
    for q in range(4):
        args = []
        if rng.random() < 0.4:
            lo = rng.randint(1, 100_000_000)
            args += ["-r", f"11:{lo}-{lo + rng.randint(10_000, 60_000_000)}"]
        if rng.random() < 0.4:
            args += rng.choice([["-G"], ["-C"], ["-G", "-C"]])
        if rng.random() < 0.3:
            args += ["-f", rng.choice(["AC>0", "AN>2", "AC!=AN"])]
        if rng.random() < 0.25:
            args += ["-n", str(rng.randint(0, 200))]
        ref = subprocess.run(
            [str(REF), "view"] + args + [f"ref{d}" for d in names],
            cwd=tmp, capture_output=True)
        if ref.returncode != 0:
            continue
        buf = io.StringIO()
        old = os.getcwd()
        os.chdir(tmp)
        try:
            ret = main_view(args + [f"our{d}" for d in names], out=buf)
        finally:
            os.chdir(old)
        assert ret == 0, (seed, args)
        assert buf.getvalue() == ref.stdout.decode(),             (seed, args, "multi-db divergence")


def one_iter(seed: int) -> None:
    rng = random.Random(seed)
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        if rng.random() < 0.25:
            multi_db_iter(rng, seed, tmp)
            return
        n_samples = rng.randint(1, 120)
        n_sites = rng.randint(20, 800)
        kw = dict(
            n_samples=n_samples, n_sites=n_sites, seed=seed,
            p_multi=rng.choice([0.0, 0.1, 0.4, 0.7]),
            p_indel=rng.choice([0.0, 0.2, 0.5]),
            p_missing=rng.choice([0.0, 0.05, 0.3]),
            phased=rng.random() < 0.8,
            with_filter=rng.random() < 0.5,
        )
        vcf = testing.random_vcf(**kw)
        gen_pb1 = rng.random() < 0.2
        pb1_args = ["-1"] if gen_pb1 else []
        mode = rng.random()
        is_vcf = True
        if mode < 0.15:
            # binary BCF input (the native BCF front-end)
            src = tmp / "in.bcf"
            testing.vcf_text_to_bcf(vcf, str(src))
            srcs = [src]
            ref_args = ["import"] + pb1_args + ["refdb", src.name]
            is_vcf = None
        elif mode < 0.30 and n_sites >= 6:
            # multi-file append (position-sorted split)
            head = [ln for ln in vcf.splitlines() if ln.startswith("#")]
            body = [ln for ln in vcf.splitlines()
                    if ln and not ln.startswith("#")]
            half = rng.randint(1, len(body) - 1)
            (tmp / "p1.vcf").write_text("\n".join(head + body[:half]) + "\n")
            (tmp / "p2.vcf").write_text("\n".join(head + body[half:]) + "\n")
            srcs = [tmp / "p1.vcf", tmp / "p2.vcf"]
            if rng.random() < 0.4:
                # mixed append: second file as BCF
                testing.vcf_text_to_bcf("\n".join(head + body[half:]) + "\n",
                                        str(tmp / "p2.bcf"))
                srcs = [tmp / "p1.vcf", tmp / "p2.bcf"]
                is_vcf = None
            ref_args = (["import", "-S"] + pb1_args + ["refdb"]
                        + [s.name for s in [tmp / "p1.vcf", tmp / "p2.vcf"]])
        else:
            src = tmp / "in.vcf"
            if rng.random() < 0.3:
                import gzip as gz
                src = tmp / "in.vcf.gz"
                with gz.open(src, "wt") as fp:
                    fp.write(vcf)
            else:
                src.write_text(vcf)
            srcs = [src]
            ref_args = ["import", "-S"] + pb1_args + ["refdb", src.name]
        res = subprocess.run([str(REF)] + ref_args, cwd=tmp,
                             capture_output=True)
        if res.returncode != 0:
            # the reference occasionally aborts on valid synthetic input
            # (e.g. assert atomic.c:25, seen at seed 25508); our import
            # must still succeed — no comparison possible
            importer.import_vcf(str(tmp / "ourdb"),
                                [str(s) for s in srcs], is_vcf=is_vcf,
                                gen_pb1=gen_pb1)
            print(f"[soak] seed {seed}: reference import crashed "
                  f"({res.stderr.decode().splitlines()[-1][:90]}); ours ok",
                  flush=True)
            return
        importer.import_vcf(str(tmp / "ourdb"), [str(s) for s in srcs],
                            is_vcf=is_vcf, gen_pb1=gen_pb1)
        # .bcf.csi joined the byte-compared set in r5 (khash-order bins)
        exts = [".bcf", ".pbf", ".spl", ".bcf.csi"] \
            + ([".pb1"] if gen_pb1 else [])
        for ext in exts:
            a = (tmp / f"ourdb{ext}").read_bytes()
            b = (tmp / f"refdb{ext}").read_bytes()
            assert a == b, (seed, kw, f"import {ext} divergence")
        (tmp / "ourdb.spl").write_text(testing.random_spl(n_samples, seed=seed))
        (tmp / "refdb.spl").write_text(testing.random_spl(n_samples, seed=seed))
        keys = subprocess.run([str(REF), "getalt", "refdb"], cwd=tmp,
                              capture_output=True).stdout.decode().splitlines()

        def rand_query():
            args = []
            if rng.random() < 0.4:
                lo = rng.randint(1, 130_000_000)
                args += ["-r", f"11:{lo}-{lo + rng.randint(1000, 40_000_000)}"]
            if rng.random() < 0.35 and n_samples >= 3:
                picks = rng.sample(range(n_samples),
                                   rng.randint(1, min(5, n_samples)))
                args += ["-s", "," + ",".join(f"S{i:04d}" for i in picks)]
            elif rng.random() < 0.3:
                args += ["-s", 'population=="CEU"']
                if rng.random() < 0.5:
                    args += ["-s", 'gender=="M"']
            if rng.random() < 0.35:
                # group-indexed vars (AC1/AN1) only with explicit groups:
                # without -s the reference reads uninitialized memory for
                # them (bgt.c:706 vs 740) — see docs/DESIGN.md §7
                pool = ["AC>0", "AN>1&&AC*2<AN", "AC!=AN"]
                if args.count("-s") >= 2:  # n_groups<=1: ref reads uninit
                    pool += ["AC1>=0", "AC1*3<AN1", "AC2>=0"]
                args += ["-f", rng.choice(pool)]
            if rng.random() < 0.3 and keys:
                pick = rng.sample(keys, rng.randint(1, min(12, len(keys))))
                args += ["-a," + ",".join(pick)]
                if rng.random() < 0.5:
                    args += rng.choice([["-S"], ["-H"], ["-S", "-H"]])
            if rng.random() < 0.3:
                args += rng.choice([["-G"], ["-C"], ["-G", "-C"]])
            if rng.random() < 0.25:
                args += ["-i", str(rng.randint(1, max(1, n_sites // 2)))]
            if rng.random() < 0.25:
                args += ["-n", str(rng.randint(0, n_sites))]
            if rng.random() < 0.15:
                tpool = ["AC,AN", "CHROM,POS,AC", "POS,END,REF"]
                if args.count("-s") >= 2:  # AC1 with <2 groups: ref uninit
                    tpool.append("POS,AC1")
                args += ["-t", rng.choice(tpool)]
            if rng.random() < 0.1:
                args += ["-M"]
            return args

        for q in range(5):
            args = rand_query()
            binary = rng.random() < 0.15 and "-t" not in args
            if binary:
                args = [a for a in args if a not in ("-S", "-H")] + ["-b"]
            ref = subprocess.run([str(REF), "view"] + args + ["refdb"],
                                 cwd=tmp, capture_output=True)
            if ref.returncode != 0:
                continue  # reference rejects the combo: nothing to compare
            if binary:
                ret, got = ours_binary(args, tmp)
                want = hashlib.md5(ref.stdout).hexdigest()
            else:
                ret, got = ours(args, tmp)
                want = ref.stdout.decode()
            assert ret == 0, (seed, args)
            assert got == want, (seed, kw, args, "query divergence")


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else int(time.time())
    t0 = time.time()
    i = 0
    while time.time() - t0 < budget:
        one_iter(seed0 + i)
        i += 1
        if i % 10 == 0:
            print(f"[soak] {i} iters, {time.time() - t0:.0f}s", flush=True)
    print(f"[soak] PASS: {i} iterations, no divergence (seed0={seed0})")


if __name__ == "__main__":
    main()
