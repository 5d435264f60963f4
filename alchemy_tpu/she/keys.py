"""Secret keys and seeded sampling.

`SK` mirrors Lol's `SK v (Cyc t m' z)` (SURVEY.md §2.3): integer coefficients
(powerful basis) sampled as a rounded Gaussian whose variance is the scaled
parameter v = r/√φ(m') supplied by the KeysHints context (KeysHints.hs:85-96).
The key stores v so encryption/hint errors reuse it (as Lol's encrypt does).

All sampling is host-side numpy from named seeds, so every backend sees the
same keys/errors — this is the determinism contract of SURVEY.md §7 (hard
part 5): bit-exactness is defined *within* the framework, across backends.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.core.ring import get_ring


def gaussian_coeffs(rng: np.random.Generator, variance: float, n: int) -> np.ndarray:
    """Rounded continuous Gaussian with the given variance, as int64."""
    return np.rint(rng.normal(0.0, math.sqrt(variance), size=n)).astype(np.int64)


def uniform_residues(rng: np.random.Generator, qs: tuple[int, ...], n: int) -> np.ndarray:
    return np.stack([rng.integers(0, q, size=n, dtype=np.int64) for q in qs])


@dataclass
class SK:
    """Secret key: small integer element of R_{m'}."""

    m: int
    variance: float
    coeffs: np.ndarray  # int64 [phi(m')], signed, powerful basis
    _cache: dict = field(default_factory=dict, repr=False)

    @staticmethod
    def generate(m: int, variance: float, rng: np.random.Generator) -> "SK":
        ring = get_ring(m)
        return SK(m, variance, gaussian_coeffs(rng, variance, ring.phi))

    def as_cyc(self, qs: tuple[int, ...], bk) -> Cyc:
        key = (qs, bk.name)
        if key not in self._cache:
            c = Cyc.from_coeffs(self.m, qs,
                np.stack([self.coeffs % q for q in qs]), bk)
            # never memoize a value created INSIDE a jit trace (the device
            # probe builds key Cycs under trace — a cached tracer would
            # escape into later eager uses, e.g. decrypt; CLAUDE.md rule)
            import jax

            if isinstance(c.data, jax.core.Tracer):
                return c
            self._cache[key] = c
        return self._cache[key]

    def error(self, qs: tuple[int, ...], rng: np.random.Generator, bk) -> tuple[Cyc, np.ndarray]:
        """Sample a fresh error with this key's variance; returns (Cyc, int coeffs)."""
        ring = get_ring(self.m)
        e = gaussian_coeffs(rng, self.variance, ring.phi)
        return Cyc.from_coeffs(self.m, qs, np.stack([e % q for q in qs]), bk), e
