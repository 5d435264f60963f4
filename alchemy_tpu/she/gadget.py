"""Gadget vectors and digit decomposition over an RNS modulus.

The gadget for a multi-limb modulus Q = ∏ q_i is the CRT gadget tensored with
a per-limb gadget (this is how Lol's pair-type gadget instances compose;
reference usage PT2CT.hs:136-140):

- `TrivGad`: per-limb part is trivial — digit i is the lift of the residue
  [c]_{q_i} (magnitude < q_i ≈ 2^30.5, matching the reference's
  Max32BitUnits hint-noise constant, PT2CT.hs:283-285).
- `BaseBGad(2)`: per-limb binary decomposition — digits are bits, so hint
  noise does not pay the digit-magnitude penalty (PT2CT.hs:140).

Digits of a ring element are *single-limb residues* (or their bits), so
re-reducing them modulo every hint limb is exact — no CRT lifting anywhere
(DESIGN.md, RNS discipline).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from alchemy_tpu.core.cyc import Cyc


def _crt_gadget_factors(qs: tuple[int, ...]) -> list[int]:
    """g_i = (Q/q_i)·[(Q/q_i)^{-1}]_{q_i} mod Q, as exact ints."""
    Q = 1
    for q in qs:
        Q *= q
    out = []
    for q in qs:
        Qi = Q // q
        out.append(Qi * pow(Qi % q, -1, q) % Q)
    return out


@dataclass(frozen=True)
class Gadget:
    """Base class; instances are stateless and hashable (used as cache keys)."""

    def num_digits(self, qs: tuple[int, ...]) -> int:
        raise NotImplementedError

    def factors(self, qs: tuple[int, ...]) -> list[int]:
        """Gadget vector entries g_k as ints mod Q."""
        raise NotImplementedError

    def digits(self, c: Cyc) -> list[Cyc]:
        """Decompose a ring element over its own modulus chain: returns
        num_digits ring elements over the same chain with Σ g_k·d_k = c."""
        raise NotImplementedError

    def digit_noise_bits(self, qs: tuple[int, ...]) -> float:
        """log2 of the max digit magnitude (for the noise ledger)."""
        raise NotImplementedError


@dataclass(frozen=True)
class TrivGad(Gadget):
    def num_digits(self, qs):
        return len(qs)

    def factors(self, qs):
        return _crt_gadget_factors(qs)

    def digits(self, c):
        arr = c.to_pow()
        rows = arr.bk.gadget_digit_rows(arr.data, arr.qs, None)
        return [Cyc(arr.ring, arr.qs, "POW", rows[i], arr.bk) for i in range(len(c.qs))]

    def digit_noise_bits(self, qs):
        import math

        return max(math.log2(q) for q in qs)

    def __repr__(self):
        return "TrivGad"


@dataclass(frozen=True)
class BaseBGad(Gadget):
    base: int = 2

    def _limb_digits(self, q: int) -> int:
        n = 0
        v = q - 1
        while v:
            n += 1
            v //= self.base
        return n

    def num_digits(self, qs):
        return sum(self._limb_digits(q) for q in qs)

    def factors(self, qs):
        crt = _crt_gadget_factors(qs)
        Q = 1
        for q in qs:
            Q *= q
        out = []
        for i, q in enumerate(qs):
            for k in range(self._limb_digits(q)):
                out.append(crt[i] * pow(self.base, k, Q) % Q)
        return out

    def digits(self, c):
        arr = c.to_pow()
        rows = arr.bk.gadget_digit_rows(arr.data, arr.qs, self.base)
        return [
            Cyc(arr.ring, arr.qs, "POW", rows[i], arr.bk)
            for i in range(rows.shape[0])
        ]

    def digit_noise_bits(self, qs):
        import math

        return math.log2(self.base)

    def __repr__(self):
        return f"BaseBGad({self.base})"
