"""Native C++ kernels vs the JAX paths: cross-language bit-identity
(the checked mode of SURVEY.md §5 'race detection/sanitizers' analog)."""

import numpy as np
import pytest

import jax.numpy as jnp

from alchemy_tpu.nt.primes import root_of_unity
from alchemy_tpu.she import fast
from alchemy_tpu.she.fast import FastParams

native = pytest.importorskip("alchemy_tpu.native")


def test_native_elemwise():
    q = 268440577
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, 1000).astype(np.uint32)
    b = rng.integers(0, q, 1000).astype(np.uint32)
    assert np.array_equal(native.zq_elemwise("add", a, b, q), (a.astype(np.int64) + b) % q)
    assert np.array_equal(
        native.zq_elemwise("mul", a, b, q),
        (a.astype(object) * b.astype(object) % q).astype(np.int64),
    )


def test_native_ntt_bit_identical_to_jax():
    from alchemy_tpu.backend.ntt import intt_negacyclic, ntt_negacyclic

    p = FastParams.make(10, 2, impl="vpu")
    rng = np.random.default_rng(1)
    for q in p.qs:
        psi = root_of_unity(2 * p.n, q)
        x = rng.integers(0, q, p.n).astype(np.uint32)
        got = native.ntt(x, q, psi)
        want = np.asarray(ntt_negacyclic(jnp.asarray(x[None]), p.n, (q,)))[0]
        assert np.array_equal(got, want)
        back = native.intt(got, q, psi)
        assert np.array_equal(back, x)
        want_i = np.asarray(intt_negacyclic(jnp.asarray(got[None]), p.n, (q,)))[0]
        assert np.array_equal(back, want_i)


def test_native_mul_relin_bit_identical():
    p = FastParams.make(8, 3, impl="vpu")
    rng = np.random.default_rng(2)
    s = fast.keygen(p, rng)
    hb, ha = fast.relin_hint(p, s, rng)
    ct1 = fast.encrypt(p, s, rng.integers(0, 2, p.n), rng)
    ct2 = fast.encrypt(p, s, rng.integers(0, 2, p.n), rng)
    want = np.asarray(fast.mul_relin(p, ct1, ct2, hb, ha))
    psis = [root_of_unity(2 * p.n, q) for q in p.qs]
    got = native.mul_relin(np.asarray(ct1), np.asarray(ct2),
                           np.asarray(hb), np.asarray(ha), p.qs, psis)
    assert np.array_equal(got, want)
