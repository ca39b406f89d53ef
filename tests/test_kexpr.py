"""Expression engine parity vs the reference kexpr CLI oracle."""

import subprocess

import numpy as np
import pytest

from bgt_tpu.core import kexpr

EXPRS = [
    "1+2",
    "2*3+4",
    "2*(3+4)",
    "7/2",
    "7//2",
    "(0-7)//2",
    "7%3",
    "(0-7)%3",
    "2**10",
    "2**0.5",
    "1<<4",
    "256>>3",
    "5&3",
    "5|3",
    "5^3",
    "~5",
    "!0",
    "!3",
    "1&&2",
    "1&&0",
    "0||2",
    "0||0",
    "3<4",
    "4<=4",
    "5>4",
    "5>=6",
    "3==3",
    "3!=3",
    "3<>4",
    "(-5)",
    "(+5)",
    "1.5+2",
    "1e3+1",
    "10/4*2",
    "1+2*3**2",
    "abs(0-7)",
    "abs(3.5-10)",
    "(1+2)*(3-4)",
    "1.0/3",
    "0x10+1",
    '"abc"=="abc"',
    '"abc"=="abd"',
    '"abc"<"abd"',
    "1 + 2 * 3",
]


@pytest.mark.parametrize("expr", EXPRS)
def test_scalar_matches_oracle(expr, ref_kexpr):
    res = subprocess.run([ref_kexpr, expr], capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    expect = res.stdout.strip()
    ke, err = kexpr.parse(expr)
    assert err == 0, f"parse error {err:#x} for {expr!r}"
    err, i, r, s, t = ke.eval()
    assert err == 0
    if t == kexpr.KEV_INT:
        got = str(i)
    elif t == kexpr.KEV_REAL:
        got = "%g" % r
    else:
        got = s
    assert got == expect, f"{expr!r}: got {got} want {expect}"


def test_variables_and_oracle(ref_kexpr):
    for expr, bind in [
        ("AC/AN>=0.1&&AC2==0", {"AC": 5, "AN": 40, "AC2": 0}),
        ("AC/AN>=0.1&&AC2==0", {"AC": 3, "AN": 40, "AC2": 0}),
        ("AC>0", {"AC": 2}),
        ("AC1/AN1>=0.1&&AC2==0", {"AC1": 7, "AN1": 20, "AC2": 1}),
    ]:
        args = [ref_kexpr, expr] + [f"{k}={v}" for k, v in bind.items()]
        res = subprocess.run(args, capture_output=True, text=True)
        expect = res.stdout.strip()
        ke, err = kexpr.parse(expr)
        assert err == 0
        for k, v in bind.items():
            ke.set_real(k, float(v))  # oracle CLI binds via ke_set_real
        err, i, r, s, t = ke.eval()
        got = str(i) if t == kexpr.KEV_INT else "%g" % r if t == kexpr.KEV_REAL else s
        assert got == expect, f"{expr!r} {bind}: got {got} want {expect}"


def test_unassigned_var_errors():
    ke, err = kexpr.parse("AC>0")
    assert err == 0
    err, i = ke.eval_int()
    assert err & kexpr.KEE_UNVAR
    ke.set_int("AC", 1)
    err, i = ke.eval_int()
    assert err == 0 and i == 1
    ke.unset()
    err, i = ke.eval_int()
    assert err & kexpr.KEE_UNVAR


def test_parse_errors():
    for expr in ["(1+2", "1+2)", "1+", "abs(1,2"]:
        ke, err = kexpr.parse(expr)
        assert err != 0, expr


def test_vector_compile_matches_scalar():
    rng = np.random.default_rng(0)
    n = 1000
    env = {
        "AC": rng.integers(0, 100, n),
        "AN": rng.integers(1, 200, n),
        "AC1": rng.integers(0, 50, n),
        "AN1": rng.integers(1, 100, n),
        "AC2": rng.integers(0, 3, n),
    }
    for expr in [
        "AC>0",
        "AC/AN>=0.1&&AC2==0",
        "AC1/AN1>=0.1&&AC2==0",
        "AC+AN*2-3",
        "(AC>10)||(AN<50)",
        "AC%7==3",
        "AC//10>2",
    ]:
        ke, err = kexpr.parse(expr)
        assert err == 0
        fn = ke.compile_vector(np)
        t, vec = fn(env)
        for j in range(0, n, 97):
            ke2, _ = kexpr.parse(expr)
            for k, v in env.items():
                ke2.set_int(k, int(v[j]))
            err, i, r, s, ty = ke2.eval()
            scalar = i if ty == kexpr.KEV_INT else r
            got = vec[j]
            assert np.isclose(float(got), float(scalar)), (expr, j, got, scalar)


def test_vector_compile_jax():
    import jax.numpy as jnp

    ke, err = kexpr.parse("AC/AN>=0.1&&AC2==0")
    assert err == 0
    fn = ke.compile_vector(jnp)
    t, vec = fn({"AC": jnp.array([5, 1]), "AN": jnp.array([40, 40]),
                 "AC2": jnp.array([0, 0])})
    assert list(np.asarray(vec)) == [1, 0]
