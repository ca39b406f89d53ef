"""Seeded property tests: PBWT codec round-trips and kexpr fuzz vs oracle."""

import subprocess

import numpy as np
import pytest

from bgt_tpu.core import kexpr
from bgt_tpu.formats.pbf import PbfReader, PbfWriter


@pytest.mark.parametrize("seed", range(6))
def test_pbf_roundtrip_random(tmp_path, seed):
    """Encode random matrices at awkward shapes, decode fully and by
    subset; both must reproduce the input (pbc_enc/dec + pbs_dec)."""
    rng = np.random.default_rng(seed)
    n_rows = int(rng.integers(1, 40))
    m = int(rng.integers(1, 70))
    shift = int(rng.integers(1, 5))
    p = rng.dirichlet([4, 2, 0.3, 0.3])
    codes = rng.choice(4, size=(n_rows, m), p=p).astype(np.uint8)
    fn = str(tmp_path / f"p{seed}.pbf")
    w = PbfWriter(fn, m, 2, shift)
    for row in codes:
        w.write_row([row & 1, row >> 1])
    w.close()
    # full decode
    r = PbfReader(fn)
    got = []
    while True:
        planes = r.read_row()
        if planes is None:
            break
        got.append((planes[1].astype(np.uint8) << 1) | planes[0])
    r.close()
    assert np.array_equal(np.array(got), codes)
    # subset decode at a random checkpointed seek
    cols = rng.choice(m, size=int(rng.integers(1, m + 1)), replace=False)
    start = int(rng.integers(0, n_rows))
    r = PbfReader(fn)
    r.subset(np.sort(cols))
    r.seek(start)
    planes = r.read_row()
    r.close()
    sub = (planes[1].astype(np.uint8) << 1) | planes[0]
    assert np.array_equal(sub, codes[start][np.sort(cols)])


def _rand_expr(rng, depth=0):
    if depth > 3 or rng.random() < 0.3:
        if rng.random() < 0.5:
            return str(rng.integers(0, 50))
        return f"{rng.integers(0, 999) / 10:.1f}"
    ops = ["+", "-", "*", "/", "//", "%", "**", "<<", ">>", "&", "|", "^",
           "<", "<=", ">", ">=", "==", "!=", "&&", "||"]
    a = _rand_expr(rng, depth + 1)
    b = _rand_expr(rng, depth + 1)
    expr = f"({a}{rng.choice(ops)}{b})"
    if rng.random() < 0.15:
        expr = "(" + rng.choice(["-", "!", "~"]) + expr + ")"
    return expr


def test_kexpr_fuzz_vs_oracle(ref_kexpr):
    """Random expression trees evaluate identically to the reference
    evaluator (skipping cases where the reference itself crashes, e.g.
    integer division by zero)."""
    rng = np.random.default_rng(42)
    n_checked = 0
    for _ in range(400):
        expr = _rand_expr(rng)
        res = subprocess.run([ref_kexpr, expr], capture_output=True, text=True)
        if res.returncode != 0:
            continue  # reference crashed (SIGFPE etc.)
        expect = res.stdout.strip()
        ke, err = kexpr.parse(expr)
        assert err == 0, expr
        try:
            err, i, r, s, t = ke.eval()
        except ZeroDivisionError:
            continue  # reference would SIGFPE; we raise instead
        assert err == 0, expr
        if t == kexpr.KEV_INT:
            got = str(i)
        elif t == kexpr.KEV_REAL:
            got = "-nan" if r != r and np.signbit(r) else "%g" % r
        else:
            got = s
        assert got == expect, f"{expr!r}: got {got} want {expect}"
        n_checked += 1
    assert n_checked > 250  # the oracle survived enough cases to matter


def test_kexpr_vector_fuzz_matches_scalar():
    """compile_vector against scalar eval on random expressions over
    random integer environments."""
    rng = np.random.default_rng(7)
    n = 64
    env = {
        "AC": rng.integers(0, 100, n),
        "AN": rng.integers(1, 200, n),
    }

    def rand_vexpr(depth=0):
        if depth > 2 or rng.random() < 0.35:
            return str(rng.integers(1, 30)) if rng.random() < 0.5 \
                else rng.choice(["AC", "AN"])
        ops = ["+", "-", "*", "<", "<=", ">", ">=", "==", "!=", "&&", "||",
               "%", "//", "&", "|", "^"]
        return f"({rand_vexpr(depth + 1)}{rng.choice(ops)}{rand_vexpr(depth + 1)})"

    for _ in range(60):
        expr = rand_vexpr()
        ke, err = kexpr.parse(expr)
        assert err == 0
        try:
            t, vec = ke.compile_vector(np)(env)
        except TypeError:
            continue
        for j in range(0, n, 13):
            ke2, _ = kexpr.parse(expr)
            for k, v in env.items():
                ke2.set_int(k, int(v[j]))
            try:
                err, i, r, s, ty = ke2.eval()
            except ZeroDivisionError:
                continue  # vector lane saturates where C would SIGFPE
            scalar = i if ty == kexpr.KEV_INT else r
            arr = np.asarray(vec)
            got = arr if arr.ndim == 0 else arr[j]
            assert np.isclose(float(got), float(scalar)), (expr, j)
