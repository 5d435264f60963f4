"""XLA backend: exact uint32 arithmetic, bit-identical to the golden model."""

import numpy as np
import pytest

from alchemy_tpu.backend import golden_backend, xla_backend
from alchemy_tpu.backend.xla import mul_u32_hilo, mulmod, mulmod_shoup, shoup_const
from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.nt.factor import totient
from alchemy_tpu.nt.primes import find_ntt_prime

import jax.numpy as jnp

GB = golden_backend()
XB = xla_backend()


def test_mul_u32_hilo_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64).astype(np.uint32)
    hi, lo = mul_u32_hilo(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(np.uint64) * b.astype(np.uint64)
    assert np.array_equal(np.asarray(hi), (prod >> 32).astype(np.uint32))
    assert np.array_equal(np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))


@pytest.mark.parametrize("q", [65537 * 2 + 1, 268440577, 1073750017, (1 << 31) - 1])
def test_mulmod_shoup_exact(q):
    rng = np.random.default_rng(q)
    a = rng.integers(0, 1 << 32, size=2000, dtype=np.uint64).astype(np.uint32)
    for w in [1, 2, q - 1, q // 2, 12345 % q]:
        ws = np.uint32(shoup_const(w, q))
        got = mulmod_shoup(jnp.asarray(a), np.uint32(w), ws, np.uint32(q))
        want = (a.astype(object) * w % q).astype(np.uint32)
        assert np.array_equal(np.asarray(got), want)


@pytest.mark.parametrize("q", [268440577, 8392193, 1073750017, (1 << 31) - 1])
def test_mulmod_exact(q):
    rng = np.random.default_rng(q)
    a = rng.integers(0, q, size=2000, dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, q, size=2000, dtype=np.int64).astype(np.uint32)
    got = mulmod(jnp.asarray(a[None]), jnp.asarray(b[None]), (q,))
    want = (a.astype(object) * b.astype(object) % q).astype(np.uint32)
    assert np.array_equal(np.asarray(got)[0], want)


@pytest.mark.parametrize("m", [8, 512, 91, 4095])
def test_transforms_bit_identical(m):
    qs = (find_ntt_prime(m, 30), find_ntt_prime(m, 29))
    rng = np.random.default_rng(m)
    coeffs = rng.integers(0, min(qs), size=(len(qs), totient(m)))
    cg = Cyc.from_coeffs(m, qs, coeffs, GB)
    cx = Cyc.from_coeffs(m, qs, coeffs, XB)
    for conv in [lambda c: c.to_crt(), lambda c: c.to_crt().to_pow()]:
        g = GB.to_numpy(conv(cg).data)
        x = XB.to_numpy(conv(cx).data)
        assert np.array_equal(g, x)


def test_ring_ops_bit_identical():
    m, qs = 448, (find_ntt_prime(448, 30), find_ntt_prime(448, 29))
    rng = np.random.default_rng(5)
    ca = rng.integers(0, min(qs), size=(2, totient(m)))
    cb = rng.integers(0, min(qs), size=(2, totient(m)))
    ag, bg = Cyc.from_coeffs(m, qs, ca, GB), Cyc.from_coeffs(m, qs, cb, GB)
    ax, bx = Cyc.from_coeffs(m, qs, ca, XB), Cyc.from_coeffs(m, qs, cb, XB)
    for op in [lambda a, b: a + b, lambda a, b: a - b, lambda a, b: (a * b).to_pow(),
               lambda a, b: -a, lambda a, b: a.scalar_mul(123456789)]:
        g = op(ag, bg)
        x = op(ax, bx)
        assert np.array_equal(GB.to_numpy(g.to_pow().data), XB.to_numpy(x.to_pow().data))


def test_embed_twace_bit_identical():
    m_sub, m = 64, 448
    q = find_ntt_prime(448, 30)
    rng = np.random.default_rng(6)
    coeffs = rng.integers(0, q, size=(1, totient(m_sub)))
    g = Cyc.from_coeffs(m_sub, (q,), coeffs, GB).embed(m)
    x = Cyc.from_coeffs(m_sub, (q,), coeffs, XB).embed(m)
    assert np.array_equal(GB.to_numpy(g.to_pow().data), XB.to_numpy(x.to_pow().data))
    gt = g.twace(m_sub)
    xt = x.twace(m_sub)
    assert np.array_equal(GB.to_numpy(gt.data), XB.to_numpy(xt.data))


def test_arithmetic_example_on_xla_backend():
    from alchemy_tpu.examples.arithmetic import run

    assert run(seed=3, backend="xla", verbose=False)


def test_homomrlwr_example_on_xla_backend():
    # the deep workload end-to-end on the XLA backend
    from alchemy_tpu.examples.homomrlwr import run

    assert run(seed=5, backend="xla", verbose=False)


def test_checked_backend_runs_arithmetic():
    # every op runs on xla + golden with per-op bit-identity assertions
    from alchemy_tpu.examples.arithmetic import run

    assert run(seed=9, backend="checked", verbose=False)
