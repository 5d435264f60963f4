import math

from alchemy_tpu.nt import (
    factorize,
    totient,
    is_prime,
    find_ntt_prime,
    primitive_root,
    root_of_unity,
    units_of_modulus,
)
from alchemy_tpu.nt.factor import crt_index_set, factor_unit_order, multiplicative_order


def test_factorize():
    assert factorize(54600) == ((2, 3), (3, 1), (5, 2), (7, 1), (13, 1))
    assert factorize(1) == ()
    assert totient(54600) == 4 * 2 * 20 * 6 * 12


def test_units_of_modulus_matches_reference_rule():
    # reference mkModulus: units = floor(log2 q / 6.1) (Noise.hs:166-170)
    assert units_of_modulus(268440577) == math.floor(math.log2(268440577) / 6.1)
    assert units_of_modulus(8392193) == 3
    assert units_of_modulus(1073750017) == 4


def test_find_ntt_prime():
    q = find_ntt_prime(512, 30)
    assert is_prime(q) and (q - 1) % 512 == 0 and q < 2**30


def test_reference_example_moduli_are_ntt_friendly():
    # the examples' moduli must support their ciphertext rings
    for q in (268440577, 8392193, 1073750017):
        assert is_prime(q) and (q - 1) % 512 == 0
    for q in (1543651201, 689270401, 718099201, 720720001, 1556755201, 1567238401):
        assert is_prime(q) and (q - 1) % 54600 == 0


def test_primitive_root():
    g = primitive_root(257)
    assert multiplicative_order(g, 257) == 256


def test_root_of_unity():
    w = root_of_unity(512, 268440577)
    assert pow(w, 512, 268440577) == 1
    assert pow(w, 256, 268440577) != 1


def test_factor_unit_order_pow2():
    assert factor_unit_order(2) == (1,)
    assert factor_unit_order(4) == (1, 3)
    order8 = factor_unit_order(8)
    assert sorted(order8) == [1, 3, 5, 7]
    # (s, j) structure: first half = 5^j, second half = -5^j
    order16 = factor_unit_order(16)
    assert order16[:4] == (1, 5, 9, 13)  # 5^j mod 16
    assert order16[4:] == (15, 11, 7, 3)  # -5^j mod 16


def test_factor_unit_order_consistent_restriction():
    # odd p: restriction (Z/p^a)* -> (Z/p^b)* is index truncation
    for pa, pb in [(25, 5), (27, 9), (49, 7)]:
        oa, ob = factor_unit_order(pa), factor_unit_order(pb)
        for k, u in enumerate(oa):
            assert u % pb == ob[k % len(ob)]
    # p = 2: per-sign-half truncation ((s, j) order)
    for pa, pb in [(16, 8), (128, 8), (64, 16)]:
        oa, ob = factor_unit_order(pa), factor_unit_order(pb)
        ha, hb = len(oa) // 2, len(ob) // 2
        for k, u in enumerate(oa):
            s, t = divmod(k, ha)
            assert u % pb == ob[s * hb + (t % hb)]


def test_crt_index_set():
    s = crt_index_set(35)
    assert sorted(s) == [i for i in range(35) if math.gcd(i, 35) == 1]
    assert len(crt_index_set(54600)) == totient(54600)
