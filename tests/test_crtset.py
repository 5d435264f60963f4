"""Relative CRT sets: idempotency, partition of unity, tower hop counts."""

import numpy as np
import pytest

from alchemy_tpu.backend import golden_backend
from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.nt.crtset import crt_set_relative, slot_cosets
from alchemy_tpu.nt.factor import fgcd, totient

BK = golden_backend()

# the example tower (Common.hs:41-54)
H = [128, 448, 2912, 3640, 5460, 4095]


def test_slot_cosets_counts():
    # (Z/7)^*/<2>: {1,2,4}, {3,6,5}
    assert slot_cosets(7, 2) == ((1, 2, 4), (3, 5, 6))
    assert len(slot_cosets(91, 2)) == 6
    assert len(slot_cosets(4095, 2)) == 144


@pytest.mark.parametrize("hop", range(5))
def test_tower_crt_set_sizes(hop):
    r, s = H[hop], H[hop + 1]
    e = fgcd(r, s)
    dim = totient(r) // totient(e)
    crts = crt_set_relative(e, s, 64)
    assert len(crts) >= dim  # "take as many as we need" (Common.hs:74-75)


@pytest.mark.parametrize(
    "e,s,pk", [(64, 448, 64), (224, 2912, 64), (4, 8, 8), (1365, 4095, 16)]
)
def test_crt_set_idempotent_partition(e, s, pk):
    crts = crt_set_relative(e, s, pk)
    cycs = [Cyc.from_coeffs(s, (pk,), c, BK) for c in crts]
    # partition of unity
    total = cycs[0]
    for c in cycs[1:]:
        total = total + c
    one = Cyc.constant(s, (pk,), 1, BK)
    assert total.equals(one)
    # each is idempotent and they are pairwise orthogonal
    for i, c in enumerate(cycs):
        assert (c * c).equals(c)
    for i in range(len(cycs)):
        for j in range(i + 1, len(cycs)):
            z = cycs[i] * cycs[j]
            zero = Cyc.zero(s, (pk,), BK)
            assert z.equals(zero)


@pytest.mark.parametrize(
    "e,s,pk", [(8, 40, 3), (8, 40, 27), (1, 7, 9), (4, 20, 81), (7, 91, 25)]
)
def test_crt_set_idempotent_partition_odd_p(e, s, pk):
    """General-p crtSet (VERDICT r3 #8: the last Lol-surface
    NotImplementedError): same partition-of-unity / idempotency /
    orthogonality laws for odd plaintext primes, via GF(p^D) idempotents."""
    crts = crt_set_relative(e, s, pk)
    cycs = [Cyc.from_coeffs(s, (pk,), c, BK) for c in crts]
    total = cycs[0]
    for c in cycs[1:]:
        total = total + c
    assert total.equals(Cyc.constant(s, (pk,), 1, BK))
    for c in cycs:
        assert (c * c).equals(c)
    for i in range(len(cycs)):
        for j in range(i + 1, len(cycs)):
            assert (cycs[i] * cycs[j]).equals(Cyc.zero(s, (pk,), BK))


def test_tunnel_p3_crt_set():
    """A ring-tunnel whose linear map is the p = 3 relative CRT set (the
    dec_to_crt construction, Common.hs:65-75, at an odd plaintext prime):
    decrypt(tunnel(enc x)) == f(x)."""
    from alchemy_tpu.nt.primes import find_ntt_prime
    from alchemy_tpu.she import bgv
    from alchemy_tpu.she.gadget import TrivGad
    from alchemy_tpu.she.keys import SK
    from alchemy_tpu.she.linear import LinearMap
    from alchemy_tpu.she.tunnel import tunnel, tunnel_hint

    r, s, e, p = 20, 56, 4, 3
    r_p = s_p = 280
    rng = np.random.default_rng(13)
    qs = tuple(find_ntt_prime(280, b) for b in (30, 29))
    sk_in = SK.generate(r_p, 1.0, rng)
    sk_out = SK.generate(s_p, 1.0, rng)
    dim = totient(r) // totient(e)
    assert dim == 4
    crts = crt_set_relative(e, s, p)
    assert len(crts) >= dim
    images = tuple(Cyc.from_coeffs(s, (p,), c, BK) for c in crts[:dim])
    f = LinearMap(e=e, r=r, s=s, images=images)
    x = Cyc.from_coeffs(r, (p,), rng.integers(0, p, size=totient(r)), BK)
    ct = bgv.encrypt(sk_in, x, r_p, qs, rng)
    hint = tunnel_hint(f, sk_out, sk_in, TrivGad(), qs, p, rng, BK)
    out = tunnel(hint, ct)
    want = f.eval(x)
    assert bgv.decrypt(sk_out, out).equals(want)
    assert bgv.error_rate(sk_out, out) < 1e-2
