"""Noise-ledger validation (SURVEY.md §4 test plan (b)): the pNoise the
compiler assigns must upper-bound the measured error rates — a ciphertext at
pNoise p should have error rate ≲ 2^(−6.1·p) (the 6.1-bit unit semantics,
Noise.hs:153-155), and every example must finish far from the decryption
failure threshold."""

import math

import numpy as np

from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.interp.error_writer import eval_with_error_rates
from alchemy_tpu.interp.keys_hints import KeysHints
from alchemy_tpu.interp.pt2ct import pt2ct
from alchemy_tpu.interp.noise import PNOISE_UNIT
from alchemy_tpu.nt.factor import totient
from alchemy_tpu.she.gadget import TrivGad


def test_arithmetic_rates_respect_ledger():
    from alchemy_tpu.examples.arithmetic import M, M_MAP, PT, ZP, ZQS, addMul

    rng = np.random.default_rng(7)
    ctx = KeysHints(3.0, seed=7)
    compiled = pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=TrivGad(), ctx=ctx)
    a1 = compiled.encrypt_arg(
        Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), ctx.bk), 0)
    a2 = compiled.encrypt_arg(
        Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), ctx.bk), 1)
    result, log = eval_with_error_rates(compiled.ir, ctx, a1, a2, strict=True)
    # the final ciphertext is at pNoise 0 → rate must beat the zero-pNoise
    # budget (MinUnits = 12 bits of headroom)
    final_rate = log[-1][1]
    assert final_rate < 2 ** (-PNOISE_UNIT * 0 - 6), final_rate
    # inputs are at pNoise 5 → fresh encryptions must respect ~2^-30.5
    fresh = log[0][1]
    assert fresh < 2 ** (-PNOISE_UNIT * 5), fresh


def test_tunnel_rates_respect_ledger():
    from alchemy_tpu.examples.common import H0, M_MAP, switch
    from alchemy_tpu.examples.tunnel import PT, ZP, ZQS
    from alchemy_tpu.she.gadget import BaseBGad

    rng = np.random.default_rng(8)
    ctx = KeysHints(3.0, seed=8)
    expr = switch(3, ZP)
    compiled = pt2ct(expr, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=BaseBGad(2), ctx=ctx)
    x = Cyc.from_coeffs(H0, (ZP,), rng.integers(0, ZP, totient(H0)), ctx.bk)
    ct = compiled.encrypt_arg(x, 0)
    # strict mode: no op may cross the decryption-failure threshold
    result, log = eval_with_error_rates(compiled.ir, ctx, ct, strict=True)
    assert all(rate < 0.01 for _, rate in log), log


def test_write_error_rates_is_object_program():
    """writeErrorRates is an IR→IR transform (ErrorRateWriter.hs): the
    Kleislified term is an ordinary object program — printable, sizeable,
    and its evaluation under the writer monad reproduces the log."""
    from alchemy_tpu.interp import pprint, size
    from alchemy_tpu.interp.error_writer import write_error_rates
    from alchemy_tpu.interp.eval import eval_ir

    from alchemy_tpu.examples.arithmetic import M, M_MAP, PT, ZP, ZQS, addMul

    rng = np.random.default_rng(9)
    ctx = KeysHints(3.0, seed=9)
    compiled = pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=TrivGad(), ctx=ctx)
    args = [
        compiled.encrypt_arg(
            Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), ctx.bk), i)
        for i in range(2)
    ]
    t = write_error_rates(compiled.ir, ctx)
    s = pprint(t)
    assert "tellError <KEY>" in s and "bind" in s and "pure" in s
    assert size(t) > size(compiled.ir)
    v, log = eval_ir(t)
    for a in args:
        v, more = v(a)
        log = log + more
    _, log2 = eval_with_error_rates(compiled.ir, ctx, *args)
    assert [name for name, _ in log] == [name for name, _ in log2]
    assert len(log) >= 4   # add, mul, keySwitchQuad, modSwitch at least


def test_device_probe_matches_host_probe():
    """she/noise_probe.error_rate_device — Garner digits, mixed-radix
    centering/negation and msd-first tournament max, all on device — equals
    the exact host CRT-lift probe bit-for-bit (VERDICT r3 #6)."""
    from alchemy_tpu.backend import xla_backend
    from alchemy_tpu.examples.arithmetic import M, M_MAP, PT, ZP, ZQS, addMul
    from alchemy_tpu.interp.eval import eval_ir
    from alchemy_tpu.she import bgv
    from alchemy_tpu.she.noise_probe import error_rate_device

    rng = np.random.default_rng(11)
    ctx = KeysHints(3.0, seed=11, bk=xla_backend())
    compiled = pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=TrivGad(),
                     ctx=ctx)
    args = [
        compiled.encrypt_arg(
            Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)),
                            ctx.bk), i)
        for i in range(2)
    ]
    out = eval_ir(compiled.ir, *args)
    for ct in (*args, out):
        sk = ctx.lookup_key(ct.m_prime)
        assert error_rate_device(sk, ct) == bgv.error_rate(sk, ct)


def test_erw_device_probe_jitted_small():
    """ERW under WHOLE-PROGRAM jit (probe digits as auxiliary jit outputs,
    interp/jit_exec noise_probe mode) matches the eager device-probe log
    bit-for-bit, and the probed program computes the same ciphertext."""
    from alchemy_tpu.backend import xla_backend
    from alchemy_tpu.examples.arithmetic import M, M_MAP, PT, ZP, ZQS, addMul
    from alchemy_tpu.interp.jit_exec import jit_compile

    rng = np.random.default_rng(12)
    ctx = KeysHints(3.0, seed=12, bk=xla_backend())
    compiled = pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=TrivGad(),
                     ctx=ctx)
    args = [
        compiled.encrypt_arg(
            Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)),
                            ctx.bk), i)
        for i in range(2)
    ]
    _, eager_log = eval_with_error_rates(compiled.ir, ctx, *args, strict=True)
    assert len(eager_log) >= 4

    jfn = jit_compile(compiled, args, noise_probe=ctx)
    out, jit_log = jfn(*args)
    assert jit_log == eager_log
    assert all(r < 0.01 for _, r in jit_log), jit_log
    from alchemy_tpu.interp.eval import eval_ir

    want = eval_ir(compiled.ir, *args)
    for cw, cg in zip(want.comps, out.comps):
        assert np.array_equal(np.asarray(cw.data), np.asarray(cg.data))


def test_erw_device_probe_tunnel_2e13_coeffs():
    """Strict ERW at ≥2^13-coefficient rings with NO host CRT lift (VERDICT
    r3 #6 done-criterion): the Tunnel chain's rings reach φ(43680) = 9216
    coefficients, every probe runs the device digit pipeline
    (she/noise_probe.py — the host probe at this size does ~10^4 python-int
    CRT lifts per op and dominated the old suite)."""
    from alchemy_tpu.backend import xla_backend
    from alchemy_tpu.examples.common import H0, H2, M_MAP, switch
    from alchemy_tpu.examples.tunnel import ZP, ZQS
    from alchemy_tpu.interp.noise import PtTy
    from alchemy_tpu.nt.factor import totient as tot
    from alchemy_tpu.she.gadget import BaseBGad

    assert tot(M_MAP[448]) >= (1 << 13)  # H1' = 29120: φ = 9216
    rng = np.random.default_rng(14)
    ctx = KeysHints(3.0, seed=14, bk=xla_backend())
    expr = switch(2, ZP, "xla")
    compiled = pt2ct(expr, res_ty=PtTy(pnoise=0, m=H2, zp=ZP), m_map=M_MAP,
                     zqs=ZQS, gad=BaseBGad(2), ctx=ctx)
    x = Cyc.from_coeffs(H0, (ZP,), rng.integers(0, ZP, totient(H0)), ctx.bk)
    ct = compiled.encrypt_arg(x, 0)
    _, log = eval_with_error_rates(compiled.ir, ctx, ct, strict=True)
    assert len(log) >= 4
    assert all(rate < 0.01 for _, rate in log), log


def test_erw_jit_strict_matches_eager_strict():
    """jit_compile(..., noise_probe=ctx, strict=True) enforces the same
    NoiseOverflowError threshold as eager strict ERW (and passes cleanly on
    a healthy program)."""
    from alchemy_tpu.backend import xla_backend
    from alchemy_tpu.examples.arithmetic import M, M_MAP, PT, ZP, ZQS, addMul
    from alchemy_tpu.interp.error_writer import (
        NOISE_OVERFLOW_THRESHOLD,
        NoiseOverflowError,
        resolve_log,
    )
    from alchemy_tpu.interp.jit_exec import jit_compile
    from alchemy_tpu.she.noise_probe import DeferredRate

    rng = np.random.default_rng(21)
    ctx = KeysHints(3.0, seed=21, bk=xla_backend())
    compiled = pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=TrivGad(),
                     ctx=ctx)
    args = [
        compiled.encrypt_arg(
            Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)),
                            ctx.bk), i)
        for i in range(2)
    ]
    jfn = jit_compile(compiled, args, noise_probe=ctx, strict=True)
    _, rates = jfn(*args)  # healthy program: no raise
    assert all(r < NOISE_OVERFLOW_THRESHOLD for _, r in rates)
    # resolve_log raises on an over-threshold deferred entry (digits of a
    # value near Q/2 → rate ≈ 0.5 > threshold)
    bad = DeferredRate(
        np.array([q // 2 for q in args[0].qs], dtype=np.int64), args[0].qs)
    import pytest as _pytest

    with _pytest.raises(NoiseOverflowError):
        resolve_log([("synthetic", bad)], strict=True)
