"""Number theory for cyclotomic rings (host-side, exact Python ints).

This is the compile-time arithmetic underlying the ring layer: factorization,
totients, primitive roots, NTT-friendly primes, and the index sets of the
tensor decomposition of the m-th cyclotomic ring.

Reference counterpart: Lol's `Crypto.Lol.Factored` type-level machinery
(consumed surface documented in SURVEY.md §2.3) — here it is ordinary runtime
arithmetic, validated at trace/compile time.
"""

from alchemy_tpu.nt.factor import (
    factorize,
    totient,
    is_prime,
    divides,
    fgcd,
    prime_power_factors,
)
from alchemy_tpu.nt.primes import (
    find_ntt_prime,
    primitive_root,
    root_of_unity,
    units_of_modulus,
)

__all__ = [
    "factorize",
    "totient",
    "is_prime",
    "divides",
    "fgcd",
    "prime_power_factors",
    "find_ntt_prime",
    "primitive_root",
    "root_of_unity",
    "units_of_modulus",
]
