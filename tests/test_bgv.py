"""BGV scheme tests on the golden backend: the differential oracle
(decrypt ∘ homomorphic op == plaintext op) for every SHE operation."""

import numpy as np
import pytest

from alchemy_tpu.backend import golden_backend
from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.nt.factor import totient
from alchemy_tpu.nt.primes import find_ntt_prime
from alchemy_tpu.she import bgv
from alchemy_tpu.she.gadget import BaseBGad, TrivGad
from alchemy_tpu.she.keys import SK
from alchemy_tpu.she.linear import LinearMap
from alchemy_tpu.she.tunnel import tunnel, tunnel_hint

BK = golden_backend()

M, MP = 4, 32  # plaintext ring F4, ciphertext ring F32
P = 8          # plaintext modulus 2^3


def chain(m_prime, n=3, bits=(30, 29, 28)):
    return tuple(find_ntt_prime(m_prime, b) for b in bits[:n])


def rand_pt(rng, m=M, p=P):
    return Cyc.from_coeffs(m, (p,), rng.integers(0, p, size=totient(m)), BK)


def setup(m_prime=MP, nlimb=3, var=1.0, seed=7):
    rng = np.random.default_rng(seed)
    qs = chain(m_prime, nlimb)
    sk = SK.generate(m_prime, var, rng)
    return rng, qs, sk


def test_encrypt_decrypt_roundtrip():
    rng, qs, sk = setup()
    pt = rand_pt(rng)
    ct = bgv.encrypt(sk, pt, MP, qs, rng)
    dec = bgv.decrypt(sk, ct)
    assert dec.equals(pt)
    assert bgv.error_rate(sk, ct) < 1e-4


def test_homomorphic_add_and_neg():
    rng, qs, sk = setup()
    a, b = rand_pt(rng), rand_pt(rng)
    ca = bgv.encrypt(sk, a, MP, qs, rng)
    cb = bgv.encrypt(sk, b, MP, qs, rng)
    assert bgv.decrypt(sk, bgv.add(ca, cb)).equals(a + b)
    assert bgv.decrypt(sk, bgv.neg(ca)).equals(-a)


def test_add_mul_public():
    rng, qs, sk = setup()
    a, k = rand_pt(rng), rand_pt(rng)
    ca = bgv.encrypt(sk, a, MP, qs, rng)
    assert bgv.decrypt(sk, bgv.add_public(k, ca)).equals(a + k)
    assert bgv.decrypt(sk, bgv.mul_public(k, ca)).equals(a * k)


@pytest.mark.parametrize("gad", [TrivGad(), BaseBGad(2)])
def test_mul_keyswitch_modswitch(gad):
    rng, qs, sk = setup()
    a, b = rand_pt(rng), rand_pt(rng)
    ca = bgv.encrypt(sk, a, MP, qs, rng)
    cb = bgv.encrypt(sk, b, MP, qs, rng)
    prod = bgv.mul(ca, cb)
    # quadratic ct already decrypts correctly against (1, s, s²)
    assert bgv.decrypt(sk, prod).equals(a * b)
    hint = bgv.ks_quad_circ_hint(sk, gad, qs, P, rng, BK)
    lin = bgv.key_switch_quad(hint, prod)
    assert lin.degree == 1
    assert bgv.decrypt(sk, lin).equals(a * b)
    # rescale down one limb, then decrypt still correct
    down = bgv.mod_switch(lin, qs[:2])
    assert bgv.decrypt(sk, down).equals(a * b)
    down2 = bgv.mod_switch(down, qs[:1])
    assert bgv.decrypt(sk, down2).equals(a * b)


def test_mod_switch_up_down():
    rng, qs, sk = setup()
    a = rand_pt(rng)
    ca = bgv.encrypt(sk, a, MP, qs[:2], rng)
    up = bgv.mod_switch(ca, qs)
    assert up.qs == qs
    assert bgv.decrypt(sk, up).equals(a)
    down = bgv.mod_switch(up, qs[:2])
    assert bgv.decrypt(sk, down).equals(a)


def test_mod_switch_reduces_error_rate():
    rng, qs, sk = setup()
    a = rand_pt(rng)
    ca = bgv.encrypt(sk, a, MP, qs, rng)
    r3 = bgv.error_rate(sk, ca)
    down = bgv.mod_switch(ca, qs[:1])
    r1 = bgv.error_rate(sk, down)
    # error *rate* should stay within a couple orders of magnitude, not blow up
    assert r1 < 1e-2
    assert bgv.decrypt(sk, down).equals(a)


def test_mod_switch_pt_div2():
    rng, qs, sk = setup()
    # plaintext 2x mod 2^3, homomorphic div2 → x mod 2^2
    x = rand_pt(rng, p=P)
    two_x = x.scalar_mul(2)
    ct = bgv.encrypt(sk, two_x, MP, qs, rng)
    half = bgv.mod_switch_pt(ct)
    assert half.zp == P // 2
    # expected: x mod 4
    x4 = Cyc.from_coeffs(M, (P // 2,), BK.to_numpy(x.data)[0] % (P // 2), BK)
    assert bgv.decrypt(sk, half).equals(x4)


def test_scale_tracking_with_non_unit_moduli():
    # a chain whose primes are ≢ 1 mod p exercises the scale factor
    rng = np.random.default_rng(3)
    m_prime, p = 32, 7
    qs = tuple(find_ntt_prime(m_prime, b) for b in (29, 27))
    assert any(q % p != 1 for q in qs)
    sk = SK.generate(m_prime, 1.0, rng)
    a = Cyc.from_coeffs(4, (p,), rng.integers(0, p, size=2), BK)
    ca = bgv.encrypt(sk, a, m_prime, qs, rng)
    down = bgv.mod_switch(ca, qs[:1])
    assert down.scale != 1  # the dropped limb is ≢ 1 mod 7
    assert bgv.decrypt(sk, down).equals(a)


@pytest.mark.parametrize("gad", [TrivGad(), BaseBGad(2)])
def test_tunnel_small(gad):
    # r=8 → s=4 over e=4; r'=24, s'=24
    r, s, e = 8, 4, 4
    r_p = s_p = 24
    p = 8
    rng = np.random.default_rng(11)
    qs = tuple(find_ntt_prime(24, b) for b in (30, 29))
    sk_in = SK.generate(r_p, 1.0, rng)
    sk_out = SK.generate(s_p, 1.0, rng)
    dim = totient(r) // totient(e)
    images = tuple(
        Cyc.from_coeffs(s, (p,), rng.integers(0, p, size=totient(s)), BK)
        for _ in range(dim)
    )
    f = LinearMap(e=e, r=r, s=s, images=images)
    x = Cyc.from_coeffs(r, (p,), rng.integers(0, p, size=totient(r)), BK)
    ct = bgv.encrypt(sk_in, x, r_p, qs, rng)
    hint = tunnel_hint(f, sk_out, sk_in, gad, qs, p, rng, BK)
    out = tunnel(hint, ct)
    want = f.eval(x)
    got = bgv.decrypt(sk_out, out)
    assert got.equals(want)
    assert bgv.error_rate(sk_out, out) < 1e-2
