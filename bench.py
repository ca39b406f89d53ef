#!/usr/bin/env python
"""Benchmark: sites/s decoded + AC-scanned on a 1kg-chr11-scale cohort.

Builds (once, cached under build/bench/) a synthetic 2,504-sample database
mirroring the structure of the canonical 1kg chr11 demo (multi-allelics,
indels, missing genotypes), verifies byte parity of `view -C` against the
reference binary compiled from /root/reference, then times the canonical
counting query (`bgt view -GC`: decode every genotype, emit per-site AC/AN)
for both engines.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value is our steady-state sites/s and vs_baseline is the speedup over the
reference binary measured on this same machine and dataset.
"""

import io
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

N_SAMPLES = 2504
N_SITES = 100000
SEED = 1337
BENCH_DIR = REPO / "build" / "bench"
QUERY = ["-G", "-C"]


def log(*a):
    print("[bench]", *a, file=sys.stderr, flush=True)


def ensure_ref():
    exe = REPO / "build" / "ref" / "bgt"
    if not exe.exists():
        subprocess.run(["sh", str(REPO / "tools" / "build_reference.sh")],
                       check=True, capture_output=True)
    return str(exe)


def ensure_db(ref_bgt: str):
    BENCH_DIR.mkdir(parents=True, exist_ok=True)
    stamp = BENCH_DIR / f"stamp-ld-{N_SAMPLES}x{N_SITES}-{SEED}"
    if stamp.exists():
        return
    from bgt_tpu import testing
    from bgt_tpu.query import importer

    log(f"generating cohort VCF ({N_SAMPLES} samples x {N_SITES} sites)...")
    vcf = testing.cohort_vcf(n_samples=N_SAMPLES, n_sites=N_SITES, seed=SEED)
    (BENCH_DIR / "in.vcf").write_text(vcf)
    log("importing (ours)...")
    t0 = time.time()
    n = importer.import_vcf(str(BENCH_DIR / "ourdb"), [str(BENCH_DIR / "in.vcf")],
                            is_vcf=True)
    log(f"our import: {n} rows in {time.time() - t0:.1f}s")
    log("importing (reference)...")
    t0 = time.time()
    subprocess.run([ref_bgt, "import", "-S", "refdb", "in.vcf"], cwd=BENCH_DIR,
                   check=True, capture_output=True)
    log(f"reference import: {time.time() - t0:.1f}s")
    assert (BENCH_DIR / "ourdb.bcf").read_bytes() == (BENCH_DIR / "refdb.bcf").read_bytes(), \
        "import .bcf parity failure"
    assert (BENCH_DIR / "ourdb.pbf").read_bytes() == (BENCH_DIR / "refdb.pbf").read_bytes(), \
        "import .pbf parity failure"
    stamp.write_text("ok")


def check_parity(ref_bgt: str, n_check: int = 500):
    """Byte parity of the emitted VCF on a prefix of the database."""
    from bgt_tpu.query.view import main_view

    ref = subprocess.run([ref_bgt, "view", "-C", "-n", str(n_check), "refdb"],
                         cwd=BENCH_DIR, capture_output=True, check=True)
    buf = io.StringIO()
    old = os.getcwd()
    os.chdir(BENCH_DIR)
    try:
        ret = main_view(["-C", "-n", str(n_check), "ourdb"], out=buf)
    finally:
        os.chdir(old)
    assert ret == 0
    if buf.getvalue() != ref.stdout.decode():
        log("WARNING: VCF byte parity check FAILED")
        return False
    log(f"VCF byte parity OK on {n_check} sites")
    return True


def time_ours() -> tuple[float, int]:
    from bgt_tpu.query.view import main_view

    class _Null(io.TextIOBase):
        def __init__(self):
            self.n = 0

        def write(self, s):
            self.n += s.count("\n")
            return len(s)

    old = os.getcwd()
    os.chdir(BENCH_DIR)
    try:
        # cold run: builds tiles + site table caches, compiles kernels
        t0 = time.time()
        sink = _Null()
        main_view(QUERY + ["ourdb"], out=sink)
        cold = time.time() - t0
        n_sites = sink.n - 1  # minus header... header lines start with #
        log(f"ours cold: {cold:.2f}s")
        best = float("inf")
        for _ in range(3):
            sink = _Null()
            t0 = time.time()
            main_view(QUERY + ["ourdb"], out=sink)
            best = min(best, time.time() - t0)
    finally:
        os.chdir(old)
    return best, n_sites


def time_ref_dump(ref_bgt: str) -> float:
    t0 = time.time()
    subprocess.run([ref_bgt, "view", "-C", "refdb"], cwd=BENCH_DIR,
                   stdout=subprocess.DEVNULL, check=True)
    return time.time() - t0


def time_ours_dump() -> float:
    from bgt_tpu.query.view import main_view

    class BinSink(io.TextIOBase):
        def __init__(self):
            outer = self

            class B:
                def write(b, data):
                    return len(data)

                def flush(b):
                    pass

            self.buffer = B()

        def write(self, s):
            return len(s)

    old = os.getcwd()
    os.chdir(BENCH_DIR)
    try:
        main_view(["-C", "-n", "2000", "ourdb"], out=BinSink())  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            main_view(["-C", "ourdb"], out=BinSink())
            best = min(best, time.time() - t0)
    finally:
        os.chdir(old)
    return best


def time_ref(ref_bgt: str) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        subprocess.run([ref_bgt, "view"] + QUERY + ["refdb"], cwd=BENCH_DIR,
                       stdout=subprocess.DEVNULL, check=True)
        best = min(best, time.time() - t0)
    return best


def count_sites(ref_bgt: str) -> int:
    out = subprocess.run([ref_bgt, "view"] + QUERY + ["refdb"], cwd=BENCH_DIR,
                         capture_output=True, check=True)
    return sum(1 for line in out.stdout.splitlines() if not line.startswith(b"#"))


def main():
    ref_bgt = ensure_ref()
    ensure_db(ref_bgt)
    parity = check_parity(ref_bgt)
    n_sites = count_sites(ref_bgt)
    t_ref = time_ref(ref_bgt)
    log(f"reference: {n_sites} sites in {t_ref:.2f}s = {n_sites / t_ref:,.0f} sites/s")
    t_ours, _ = time_ours()
    ours_rate = n_sites / t_ours
    # secondary: full-matrix GT dump (view -C), both engines
    try:
        t_dump_ref = time_ref_dump(ref_bgt)
        t_dump_ours = time_ours_dump()
        log(f"full -C dump: ours {t_dump_ours:.2f}s vs reference {t_dump_ref:.2f}s "
            f"({t_dump_ref / t_dump_ours:.1f}x)")
    except Exception as e:
        log(f"dump benchmark skipped: {e}")
    log(f"ours: {n_sites} sites in {t_ours:.2f}s = {ours_rate:,.0f} sites/s")
    gt_rate = ours_rate * N_SAMPLES * 2
    log(f"ours genotype throughput: {gt_rate / 1e6:,.0f} M genotypes/s")
    value = ours_rate if parity else 0.0
    print(json.dumps({
        "metric": "sites/s decoded+AC-scanned (2504 samples, view -GC)",
        "value": round(value, 1),
        "unit": "sites/s",
        "vs_baseline": round(t_ref / t_ours, 3),
    }))


if __name__ == "__main__":
    main()
