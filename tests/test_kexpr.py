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


MATH_EXPRS = [
    "sqrt(2)",
    "sqrt(4)",
    "exp(1)",
    "exp(0)",
    "log(2.718281828459045)",
    "log(10)",
    "log10(1000)",
    "sin(1)",
    "cos(1)",
    "tan(0.5)",
    "pow(2,10)",
    "pow(2,0.5)",
    "sqrt(2)+exp(1)*2",
    "log(exp(3))",
    "pow(sqrt(2),2)",
    "abs(sin(3)-1)",
]


@pytest.mark.parametrize("expr", MATH_EXPRS)
def test_default_math_funcs_match_oracle(expr, ref_kexpr):
    """ke_set_default_func parity (reference kexpr.c:494-506, bound at :556)."""
    res = subprocess.run([ref_kexpr, expr], capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    expect = res.stdout.strip()
    ke, err = kexpr.parse(expr)
    assert err == 0, f"parse error {err:#x} for {expr!r}"
    n = ke.set_default_func()
    assert n >= 1
    err, i, r, s, t = ke.eval()
    assert err == 0
    got = str(i) if t == kexpr.KEV_INT else "%g" % r if t == kexpr.KEV_REAL else s
    assert got == expect, f"{expr!r}: got {got} want {expect}"


def test_math_funcs_cli_parity(ref_kexpr):
    """Our `bgt kexpr` subcommand matches the reference standalone evaluator."""
    import io

    from bgt_tpu import cli

    for expr in ["sqrt(2)", "pow(3,4)", "log10(50)+sin(2)"]:
        res = subprocess.run([ref_kexpr, expr], capture_output=True, text=True)
        out, errbuf = io.StringIO(), io.StringIO()
        rc = cli.main_kexpr([expr], out=out, err=errbuf)
        assert rc == 0
        assert out.getvalue() == res.stdout, expr


def test_undefined_func_warning(ref_kexpr):
    """An unbound function returns its first argument with KEE_UNFUNC set
    (reference kexpr.c:383-390 else-branch)."""
    res = subprocess.run([ref_kexpr, "frob(7)"], capture_output=True, text=True)
    expect = res.stdout.strip()
    ke, err = kexpr.parse("frob(7)")
    assert err == 0
    ke.set_default_func()
    err, i, r, s, t = ke.eval()
    assert err & kexpr.KEE_UNFUNC
    got = str(i) if t == kexpr.KEV_INT else "%g" % r if t == kexpr.KEV_REAL else s
    assert got == expect


def test_vector_math_funcs_match_scalar():
    rng = np.random.default_rng(1)
    n = 257
    env = {"AC": rng.integers(1, 100, n), "AN": rng.integers(1, 200, n)}
    for expr in ["sqrt(AC)", "log(AN)+exp(AC/AN)", "pow(AC,2)-AN",
                 "log10(AN)>1.5", "sin(AC)*cos(AN)+tan(AC/AN)"]:
        ke, err = kexpr.parse(expr)
        assert err == 0
        ke.set_default_func()
        fn = ke.compile_vector(np)
        t, vec = fn(env)
        for j in range(0, n, 41):
            ke2, _ = kexpr.parse(expr)
            ke2.set_default_func()
            for k, v in env.items():
                ke2.set_int(k, int(v[j]))
            err, i, r, s, ty = ke2.eval()
            scalar = i if ty == kexpr.KEV_INT else r
            assert np.isclose(float(vec[j]), float(scalar)), (expr, j)


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
