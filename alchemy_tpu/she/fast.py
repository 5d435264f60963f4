"""Fused, jittable BGV ops on raw arrays — the TPU hot path.

Operates on power-of-2 rings (backend/ntt.py) with ciphertexts as
`uint32[ncomp, L, n]` in the NTT (evaluation) domain. This is the flagship
compute step for the benchmark configs (BASELINE.json configs[3]-[4]): fused
ciphertext multiply + gadget re-linearization + rescale, compiled as one XLA
program (`jax.jit`), batchable with `jax.vmap`, shardable with shard_map
(parallel/).

The CRT-gadget digit decomposition needs one inverse NTT (to coefficients)
and L forward NTTs (one per digit) — the standard RNS relinearization
dataflow. Digits are single-limb residues reduced into every limb exactly
(DESIGN.md RNS discipline; matches she/gadget.py TrivGad).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from alchemy_tpu.backend.ntt import intt_negacyclic, ntt_negacyclic, ntt_tables
from alchemy_tpu.backend.xla import (
    _cond_sub,
    _split,
    mulmod,
    mulmod_shoup,
    shoup_const,
)
from alchemy_tpu.nt.primes import find_ntt_prime
from alchemy_tpu.she.keys import gaussian_coeffs, uniform_residues


@dataclass(frozen=True)
class FastParams:
    """Static configuration of the fast path."""

    n: int                    # φ(m') — power of two
    qs: tuple[int, ...]       # RNS chain (all ≡ 1 mod 2n)
    zp: int = 2               # plaintext modulus

    @staticmethod
    def make(log_n: int, nlimb: int, zp: int = 2, bits: int = 30) -> "FastParams":
        n = 1 << log_n
        qs: list[int] = []
        while len(qs) < nlimb:
            qs.append(find_ntt_prime(2 * n, bits, avoid=tuple(qs)))
        return FastParams(n=n, qs=tuple(qs), zp=zp)


def _reduce_u32(v, q, r16, r16s):
    """v mod q for arbitrary uint32 v (q > 2^16)."""
    ll, lh = _split(v)
    return _cond_sub(mulmod_shoup(lh, r16, r16s, q) + ll, q)


@lru_cache(maxsize=None)
def _fast_consts(p: FastParams):
    qs = p.qs
    L = len(qs)
    q = np.array(qs, dtype=np.uint32)[:, None]
    r16 = [(1 << 16) % qi for qi in qs]
    return {
        "q": q,
        "r16": np.array(r16, dtype=np.uint32)[:, None],
        "r16s": np.array(
            [shoup_const(w, qi) for w, qi in zip(r16, qs)], dtype=np.uint32
        )[:, None],
    }


# ---------------------------------------------------------------------------
# key / hint generation (host-side sampling, device-resident results)
# ---------------------------------------------------------------------------


def keygen(p: FastParams, rng: np.random.Generator, variance: float = 1.0):
    """Secret key in NTT domain: [L, n]."""
    s = gaussian_coeffs(rng, variance, p.n)
    s_res = jnp.asarray(np.stack([s % q for q in p.qs]).astype(np.uint32))
    return ntt_negacyclic(s_res, p.n, p.qs)


def relin_hint(p: FastParams, s_ntt, rng: np.random.Generator, variance: float = 1.0):
    """CRT-gadget hint for s² under s: returns (B, A) each [L, L, n] in the
    NTT domain; row i satisfies B_i + A_i·s = g_i·s² + zp·e_i (mod Q)."""
    L, n = len(p.qs), p.n
    Q = 1
    for q in p.qs:
        Q *= q
    s2 = mulmod(s_ntt, s_ntt, p.qs)
    Bs, As = [], []
    for i, qi in enumerate(p.qs):
        Qi = Q // qi
        g = Qi * pow(Qi % qi, -1, qi) % Q
        a = jnp.asarray(uniform_residues(rng, p.qs, n).astype(np.uint32))
        a_ntt = ntt_negacyclic(a, n, p.qs)
        e = gaussian_coeffs(rng, variance, n)
        e_res = jnp.asarray(np.stack([(e * p.zp) % q for q in p.qs]).astype(np.uint32))
        e_ntt = ntt_negacyclic(e_res, n, p.qs)
        g_limbs = np.array([g % q for q in p.qs], dtype=np.uint32)[:, None]
        g_s = np.array(
            [shoup_const(g % q, q) for q in p.qs], dtype=np.uint32
        )[:, None]
        gs2 = mulmod_shoup(s2, jnp.asarray(g_limbs), jnp.asarray(g_s), _fast_consts(p)["q"])
        b = _sub(_add(gs2, e_ntt, p), mulmod(a_ntt, s_ntt, p.qs), p)
        Bs.append(b)
        As.append(a_ntt)
    return jnp.stack(Bs), jnp.stack(As)


def encrypt(p: FastParams, s_ntt, msg_coeffs: np.ndarray, rng: np.random.Generator,
            variance: float = 1.0):
    """Fresh ciphertext [2, L, n] (NTT domain) encrypting msg (mod zp)."""
    n = p.n
    lift = np.asarray(msg_coeffs, dtype=np.int64) % p.zp
    lift = np.where(lift > p.zp // 2, lift - p.zp, lift)
    mu = jnp.asarray(np.stack([lift % q for q in p.qs]).astype(np.uint32))
    mu_ntt = ntt_negacyclic(mu, n, p.qs)
    a = jnp.asarray(uniform_residues(rng, p.qs, n).astype(np.uint32))
    a_ntt = ntt_negacyclic(a, n, p.qs)
    e = gaussian_coeffs(rng, variance, n)
    pe = jnp.asarray(np.stack([(e * p.zp) % q for q in p.qs]).astype(np.uint32))
    pe_ntt = ntt_negacyclic(pe, n, p.qs)
    c0 = _sub(_add(mu_ntt, pe_ntt, p), mulmod(a_ntt, s_ntt, p.qs), p)
    return jnp.stack([c0, a_ntt])


def decrypt(p: FastParams, s_ntt, ct) -> np.ndarray:
    """Host decrypt (exact CRT lift) → coefficients mod zp."""
    acc = ct[0]
    spow = None
    for k in range(1, ct.shape[0]):
        spow = s_ntt if spow is None else mulmod(spow, s_ntt, p.qs)
        acc = _add(acc, mulmod(ct[k], spow, p.qs), p)
    coeff = np.asarray(intt_negacyclic(acc, p.n, p.qs)).astype(np.int64)
    Q = 1
    for q in p.qs:
        Q *= q
    basis = []
    for q in p.qs:
        Qi = Q // q
        basis.append(Qi * pow(Qi % q, -1, q))
    out = np.zeros(p.n, dtype=np.int64)
    for j in range(p.n):
        v = sum(int(coeff[i, j]) * basis[i] for i in range(len(p.qs))) % Q
        if v > Q // 2:
            v -= Q
        out[j] = v % p.zp
    return out


# ---------------------------------------------------------------------------
# the fused hot op
# ---------------------------------------------------------------------------


def _add(a, b, p: FastParams):
    return _cond_sub(a + b, _fast_consts(p)["q"])


def _sub(a, b, p: FastParams):
    q = _fast_consts(p)["q"]
    return jnp.where(a >= b, a - b, a + q - b)


@partial(jax.jit, static_argnums=0)
def mul_relin(p: FastParams, ct_a, ct_b, hint_b, hint_a):
    """Fused BGV multiply + relinearize: [2, L, n] × [2, L, n] → [2, L, n].

    Inputs/outputs in the NTT domain at the full chain; hints [L, L, n].
    """
    qs = p.qs
    a0, a1 = ct_a[0], ct_a[1]
    b0, b1 = ct_b[0], ct_b[1]
    c0 = mulmod(a0, b0, qs)
    c1 = _add(mulmod(a0, b1, qs), mulmod(a1, b0, qs), p)
    c2 = mulmod(a1, b1, qs)
    # CRT-gadget digits of c2: coefficients per limb, re-reduced to all limbs
    c2_coeff = intt_negacyclic(c2, p.n, qs)
    consts = _fast_consts(p)
    out0, out1 = c0, c1
    for i in range(len(qs)):
        row = c2_coeff[i][None, :]  # [1, n] residues < q_i
        dig = _reduce_u32(
            jnp.broadcast_to(row, c2_coeff.shape),
            consts["q"], consts["r16"], consts["r16s"],
        )
        dig_ntt = ntt_negacyclic(dig, p.n, qs)
        out0 = _add(out0, mulmod(dig_ntt, hint_b[i], qs), p)
        out1 = _add(out1, mulmod(dig_ntt, hint_a[i], qs), p)
    return jnp.stack([out0, out1])


@partial(jax.jit, static_argnums=(0, 2))
def rescale(p: FastParams, ct, k_drop: int = 1):
    """Exact BGV rescale dropping the last k_drop limbs (NTT-domain in/out).

    Plaintext-scale bookkeeping is the caller's job (the chain primes are
    ≡ 1 mod zp in the benchmark configs, so the scale stays 1)."""
    out = ct
    qs = list(p.qs)
    for _ in range(k_drop):
        n = p.n
        qs_t = tuple(qs)
        coeff = intt_negacyclic(out, n, qs_t)  # [ncomp, L, n]
        qk = qs[-1]
        new_qs = tuple(qs[:-1])
        r = coeff[..., -1, :]
        half = np.uint32(qk // 2)
        is_neg = r > half
        pz = p.zp
        mask = np.uint32(pz - 1)
        r_mod_p = r & mask
        qk_mod_p = np.uint32(qk % pz)
        rc_mod_p = jnp.where(is_neg, (r_mod_p + pz - (qk_mod_p & mask)) & mask, r_mod_p)
        inv_qk_p = np.uint32(pow(qk, -1, pz))
        t = (((pz - rc_mod_p) & mask) * inv_qk_p) & mask  # (−r_c)·q_k^{-1} mod p
        t_neg = t > pz // 2
        rows = []
        for j, qj in enumerate(new_qs):
            qj32 = np.uint32(qj)
            r16 = np.uint32((1 << 16) % qj)
            r16s = np.uint32(shoup_const((1 << 16) % qj, qj))
            r_red = _reduce_u32(r, qj32, r16, r16s)
            qk_mod = np.uint32(qk % qj)
            rc = jnp.where(is_neg, jnp.where(r_red >= qk_mod, r_red - qk_mod,
                                             r_red + qj32 - qk_mod), r_red)
            tc = jnp.where(t_neg, qj32 - (np.uint32(pz) - t), t)
            qkt = mulmod_shoup(tc, qk_mod, np.uint32(shoup_const(qk % qj, qj)), qj32)
            delta = _cond_sub(rc + qkt, qj32)
            cj = coeff[..., j, :]
            diff = jnp.where(cj >= delta, cj - delta, cj + qj32 - delta)
            inv_qk = pow(qk, -1, qj)
            rows.append(
                mulmod_shoup(diff, np.uint32(inv_qk), np.uint32(shoup_const(inv_qk, qj)), qj32)
            )
        out = jnp.stack(rows, axis=-2)
        qs = list(new_qs)
        p = FastParams(n=p.n, qs=tuple(qs), zp=p.zp)
        out = ntt_negacyclic(out, p.n, p.qs)
    return out
