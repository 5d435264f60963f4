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
