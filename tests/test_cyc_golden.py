"""Ring-layer tests on the golden backend: transforms vs naive polynomial
arithmetic, and algebraic laws of embed/twace/rel_coeffs."""

import numpy as np
import pytest

from alchemy_tpu.backend import golden_backend
from alchemy_tpu.core.cyc import Cyc, crt_lift_host
from alchemy_tpu.core.ring import get_ring, power_reduction_matrix
from alchemy_tpu.nt.factor import totient
from alchemy_tpu.nt.primes import find_ntt_prime

BK = golden_backend()
RNG = np.random.default_rng(0)


def rand_cyc(m, qs, seed=None):
    rng = np.random.default_rng(seed) if seed is not None else RNG
    ring = get_ring(m)
    coeffs = rng.integers(0, min(qs), size=(len(qs), ring.phi))
    # same underlying integer in every limb for cross-limb checks
    coeffs = np.broadcast_to(coeffs[0], (len(qs), ring.phi)).copy()
    return Cyc.from_coeffs(m, qs, coeffs, BK)


def naive_cyclotomic_mul(m, a, b, q):
    """Schoolbook multiply of two coefficient vectors in Z_q[x]/Φ_m(x),
    working in the *power basis of each tensor factor* (i.e. the powerful
    basis): multiply factor-wise using the power_reduction_matrix."""
    ring = get_ring(m)
    shape = ring.shape
    A = np.asarray(a, dtype=object).reshape(shape)
    B = np.asarray(b, dtype=object).reshape(shape)
    out = np.zeros(shape, dtype=object)
    for idx_a in np.ndindex(*shape):
        va = A[idx_a]
        if va == 0:
            continue
        for idx_b in np.ndindex(*shape):
            vb = B[idx_b]
            if vb == 0:
                continue
            # exponents add per factor; reduce each axis into powerful coords
            contrib = np.asarray(va * vb, dtype=object)
            for ax, f in enumerate(ring.factors):
                row = power_reduction_matrix(f.pe)[(idx_a[ax] + idx_b[ax]) % f.pe]
                contrib = np.multiply.outer(contrib, row.astype(object))
            out += contrib
    return np.asarray([int(x) % q for x in out.reshape(-1)], dtype=np.int64)


@pytest.mark.parametrize("m", [8, 512, 7, 9, 35, 91, 128])
def test_crt_roundtrip(m):
    q = find_ntt_prime(m, 30)
    x = rand_cyc(m, (q,))
    y = x.to_crt().to_pow()
    assert np.array_equal(BK.to_numpy(x.data), BK.to_numpy(y.data))


@pytest.mark.parametrize("m", [8, 16, 7, 35, 91])
def test_crt_mul_matches_naive(m):
    q = find_ntt_prime(m, 28)
    rng = np.random.default_rng(m)
    phi = totient(m)
    a = rng.integers(0, q, size=phi)
    b = rng.integers(0, q, size=phi)
    ca = Cyc.from_coeffs(m, (q,), a, BK)
    cb = Cyc.from_coeffs(m, (q,), b, BK)
    got = BK.to_numpy((ca * cb).to_pow().data)[0]
    want = naive_cyclotomic_mul(m, a, b, q)
    assert np.array_equal(got, want)


def test_mul_multilimb_consistent():
    m = 32
    qs = (find_ntt_prime(m, 30), find_ntt_prime(m, 29))
    a, b = rand_cyc(m, qs, seed=1), rand_cyc(m, qs, seed=2)
    prod = (a * b).to_pow()
    # each limb must equal the single-limb product mod its own q
    for i, q in enumerate(qs):
        a1 = Cyc.from_coeffs(m, (q,), BK.to_numpy(a.data)[i], BK)
        b1 = Cyc.from_coeffs(m, (q,), BK.to_numpy(b.data)[i], BK)
        p1 = (a1 * b1).to_pow()
        assert np.array_equal(BK.to_numpy(prod.data)[i], BK.to_numpy(p1.data)[0])


@pytest.mark.parametrize("m_sub,m", [(4, 512), (64, 128), (7, 91), (128, 11648), (1365, 4095)])
def test_twace_embed_identity(m_sub, m):
    q = find_ntt_prime(m, 30)
    x = rand_cyc(m_sub, (q,))
    y = x.embed(m).twace(m_sub)
    assert np.array_equal(BK.to_numpy(x.to_pow().data), BK.to_numpy(y.to_pow().data))


@pytest.mark.parametrize("m_sub,m", [(4, 512), (7, 91), (64, 448)])
def test_embed_is_ring_hom(m_sub, m):
    q = find_ntt_prime(m, 30)
    a, b = rand_cyc(m_sub, (q,), seed=3), rand_cyc(m_sub, (q,), seed=4)
    lhs = (a * b).embed(m)
    rhs = a.embed(m) * b.embed(m)
    assert lhs.to_pow().equals(rhs.to_pow())


@pytest.mark.parametrize("m_sub,m", [(4, 512), (7, 91), (128, 11648)])
def test_embed_crt_equals_embed_pow(m_sub, m):
    q = find_ntt_prime(m, 30)
    x = rand_cyc(m_sub, (q,))
    via_pow = x.to_pow().embed(m).to_pow()
    via_crt = x.to_crt().embed(m).to_pow()
    assert np.array_equal(BK.to_numpy(via_pow.data), BK.to_numpy(via_crt.data))


@pytest.mark.parametrize("m_sub,m", [(64, 128), (224, 448), (7, 91), (728, 2912)])
def test_rel_coeffs_roundtrip(m_sub, m):
    q = find_ntt_prime(m, 30)
    x = rand_cyc(m, (q,))
    coeffs = x.rel_coeffs(m_sub)
    assert len(coeffs) == totient(m) // totient(m_sub)
    y = Cyc.from_rel_coeffs(m, m_sub, coeffs, (q,), BK)
    assert np.array_equal(BK.to_numpy(x.to_pow().data), BK.to_numpy(y.data))


def test_rel_coeffs_are_module_coords():
    # x = Σ_j d_j · embed(c_j): verify via explicit reconstruction by ring ops
    m_sub, m = 64, 448
    q = find_ntt_prime(m, 30)
    x = rand_cyc(m, (q,))
    coeffs = x.rel_coeffs(m_sub)
    subs, rels = x.rel_split_shape(m_sub)
    ring = get_ring(m)
    # relative basis element for multi-index j: product of x_f^{j_f}
    total = Cyc.zero(m, (q,), BK)
    import itertools

    for flat, multi in enumerate(itertools.product(*[range(r) for r in rels])):
        basis_coeffs = np.zeros(ring.shape, dtype=np.int64)
        idx = tuple(m_i for m_i in multi)
        basis_coeffs[idx] = 1
        d_j = Cyc.from_coeffs(m, (q,), basis_coeffs.reshape(-1), BK)
        total = total + d_j * coeffs[flat].embed(m)
    assert total.to_pow().equals(x.to_pow())


def test_crt_lift_host():
    m = 8
    qs = (97, 113)
    x = Cyc.from_coeffs(m, qs, np.array([5, 96 * 113 + 1, 0, 97 * 113 - 3]) % (97 * 113), BK)
    lifted = crt_lift_host(x)
    assert lifted[0] == 5
    assert lifted[3] == -3


# -- decoding basis (Lol `l`/`lInv`; LPR toolkit §6) --------------------------


def test_dec_basis_prime_difference_structure():
    """For prime m: d_0 = 1, d_j = ζ^j − ζ^{j−1} (powerful = L·decoding)."""
    q, m = 29, 7
    for j in range(6):
        coeffs = [Cyc.constant(1, (q,), 1 if k == j else 0, BK) for k in range(6)]
        dj = Cyc.from_rel_coeffs(m, 1, coeffs, (q,), BK, basis="dec")
        pow_c = BK.to_numpy(dj.to_pow().data)[0] % q
        expect = np.zeros(6, dtype=np.int64)
        expect[j] = 1
        if j > 0:
            expect[j - 1] = q - 1
        assert np.array_equal(pow_c, expect % q), (j, pow_c, expect)


@pytest.mark.parametrize("m_sub,m", [(3, 63), (9, 63), (7, 63), (8, 56), (4, 84)])
def test_rel_coeffs_dec_roundtrip(m_sub, m):
    q = 29
    rng = np.random.default_rng(3)
    x = Cyc.from_coeffs(m, (q,), rng.integers(0, q, totient(m)), BK)
    cs = x.rel_coeffs(m_sub, basis="dec")
    y = Cyc.from_rel_coeffs(m, m_sub, cs, (q,), BK, basis="dec")
    assert x.equals(y)


def test_rel_coeffs_dec_are_module_coords():
    """x = Σ_j d_j·embed(x_j) with d_j the relative decoding basis."""
    q, r, e = 29, 63, 9
    rng = np.random.default_rng(4)
    x = Cyc.from_coeffs(r, (q,), rng.integers(0, q, totient(r)), BK)
    cs = x.rel_coeffs(e, basis="dec")
    acc = None
    for j, cj in enumerate(cs):
        unit = [Cyc.constant(e, (q,), 1 if k == j else 0, BK) for k in range(len(cs))]
        dj = Cyc.from_rel_coeffs(r, e, unit, (q,), BK, basis="dec")
        term = dj * cj.embed(r)
        acc = term if acc is None else acc + term
    assert x.equals(acc)


def test_rel_dec_matches_pow_on_shared_primes():
    """On extensions whose relative part has no new odd primes, the relative
    decoding and powerful bases coincide (toolkit: pure powers there)."""
    q, r, e = 29, 63, 21   # r/e = 3: the 3-part grows, 3 | e and 7 | e
    rng = np.random.default_rng(5)
    x = Cyc.from_coeffs(r, (q,), rng.integers(0, q, totient(r)), BK)
    a = x.rel_coeffs(e, basis="dec")
    b = x.rel_coeffs(e, basis="pow")
    assert all(ca.equals(cb) for ca, cb in zip(a, b))


def test_plaintext_mul_large_modulus_multiprime():
    """Plaintext-side ring mul beyond the single-scratch-prime bound (the
    round-2 documented cliff): a ~20-bit plaintext modulus forces the
    multi-prime CRT reconstruction; checked against an exact object-int
    negacyclic convolution."""
    import numpy as np

    from alchemy_tpu.backend import golden_backend
    from alchemy_tpu.core.cyc import Cyc

    BK = golden_backend()
    m = 64  # phi = 32, power of 2 -> negacyclic host check is easy
    p = (1 << 20) + 7   # odd, not NTT-friendly for m -> _plaintext_mul path
    rng = np.random.default_rng(2)
    a = rng.integers(0, p, 32)
    b = rng.integers(0, p, 32)
    ca = Cyc.from_coeffs(m, (p,), a, BK)
    cb = Cyc.from_coeffs(m, (p,), b, BK)
    got = BK.to_numpy((ca * cb).to_pow().data)[0]
    # exact negacyclic convolution with python ints
    n = 32
    want = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            v = int(a[i]) * int(b[j])
            if k < n:
                want[k] += v
            else:
                want[k - n] -= v
    want = np.array([w % p for w in want], dtype=np.int64)
    assert np.array_equal(got, want)
