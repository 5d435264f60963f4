"""Deep-circuit config (BASELINE.json configs[3]): depth-D multiply chain
with full relinearization and dynamic noise management (rescale one limb per
level) on a power-of-2 ring.

The workload is a squaring chain mod 2: over F_2, (Σ a_i x^i)² = Σ a_i x^{2i}
(Frobenius), so the expected plaintext after D levels is the coefficient
permutation j ↦ 2^D·j mod 2n (with negacyclic wrap, which vanishes mod 2) —
an O(n) exact host check at any depth.

Noise management: per level ℓ the ciphertext is multiplied with itself,
relinearized with the level-ℓ hint, and rescaled by one ~30-bit limb. The
steady-state absolute error is the rescale rounding term (~p·|s|₁/2), so a
depth-D chain needs D+2 limbs.
"""

from __future__ import annotations

import numpy as np

from alchemy_tpu.she import fast
from alchemy_tpu.she.fast import FastParams


def expected_square_chain_mod2(msg: np.ndarray, n: int, depth: int) -> np.ndarray:
    """Coefficients of msg^(2^depth) in Z_2[x]/(x^n+1)."""
    cur = np.asarray(msg, dtype=np.int64) % 2
    for _ in range(depth):
        nxt = np.zeros(n, dtype=np.int64)
        idx = (2 * np.arange(n)) % (2 * n)
        for j in range(n):
            t = idx[j]
            if t < n:
                nxt[t] ^= cur[j]
            else:
                nxt[t - n] ^= cur[j]  # x^n = -1 ≡ 1 mod 2
        cur = nxt
    return cur


def run(log_n: int = 9, depth: int = 16, seed: int = 0, verbose: bool = True,
        impl: str | None = None, ks: str = "trivgad"):
    """Returns (ok, levels) — decrypt-correct after `depth` mul+relin+rescale
    levels. ks="hybrid" relinearizes with dnum-grouped hybrid key-switching
    (she/hybrid.py) — the cheaper choice at this workload's deep chains."""
    kwargs = {} if impl is None else {"impl": impl}
    p = FastParams.make(log_n, depth + 2, zp=2, **kwargs)
    if ks == "auto":
        # measured crossover (BASELINE.md): hybrid wins from L ≳ 12
        ks = "hybrid" if len(p.qs) >= 12 else "trivgad"
    rng = np.random.default_rng(seed)
    s_int = None

    from alchemy_tpu.she.keys import gaussian_coeffs
    import jax.numpy as jnp

    s_int = gaussian_coeffs(rng, 1.0, p.n)

    def key_at(pp):
        res = np.stack([s_int % q for q in pp.qs]).astype(np.uint32)
        return fast._ntt_p(pp, jnp.asarray(res))

    s = key_at(p)
    msg = rng.integers(0, 2, p.n)
    ct = fast.encrypt(p, s, msg, rng)

    cur_p = p
    for level in range(depth):
        if ks == "hybrid":
            from alchemy_tpu.she.hybrid import (
                HybridKS, hybrid_relin_hint, mul_relin_hybrid)

            hk = HybridKS.make(cur_p)
            hb, ha = hybrid_relin_hint(hk, s_int, rng)
            ct = mul_relin_hybrid(hk, ct, ct, hb, ha)
        else:
            sl = key_at(cur_p)
            hb, ha = fast.relin_hint(cur_p, sl, rng, shoup=True)
            ct = fast.mul_relin(cur_p, ct, ct, hb, ha)
        ct = fast.rescale(cur_p, ct, 1)
        cur_p = FastParams(n=cur_p.n, qs=cur_p.qs[:-1], zp=cur_p.zp, impl=cur_p.impl)
        if verbose:
            print(f"level {level + 1}: limbs={len(cur_p.qs)}")

    dec = fast.decrypt(cur_p, key_at(cur_p), ct)
    want = expected_square_chain_mod2(msg, p.n, depth)
    ok = bool(np.array_equal(dec, want))
    if verbose:
        print("PASS" if ok else "FAIL")
    return ok, depth


if __name__ == "__main__":
    import os
    import sys

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/alchemy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    ok, _ = run(
        log_n=int(os.environ.get("DEEP_LOG_N", "13")),
        depth=int(os.environ.get("DEEP_DEPTH", "16")),
        ks=os.environ.get("DEEP_KS", "trivgad"),
        impl=os.environ.get("DEEP_IMPL") or None,
    )
    sys.exit(0 if ok else 1)
