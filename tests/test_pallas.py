"""Pallas kernels (fused 4-step NTT, fused mul+relin): logic validation in
interpreter mode on CPU (bit-identical to the jnp MXU path).

The native Mosaic path runs on the real TPU (exercised by bench.py with
impl="pallas" and by scripts/verify_device.py); the suite itself is
CPU-pinned (conftest.py), so set ALCHEMY_PALLAS_NATIVE=1 on a TPU-visible
session to run the native tests too.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _patch_interpret(monkeypatch):
    from jax.experimental import pallas as pl

    import alchemy_tpu.backend.pallas.ntt_pallas as npk

    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(npk.pl, "pallas_call", patched)
    return npk


def test_pallas_ntt_interpret_bit_identical(monkeypatch):
    npk = _patch_interpret(monkeypatch)
    from alchemy_tpu.backend.ntt_mxu import ntt_mxu
    from alchemy_tpu.she.fast import FastParams

    p = FastParams.make(10, 2)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, p.n) for q in p.qs]).astype(np.uint32)
    xd = jnp.asarray(x)
    y_pl = npk.ntt_pallas(xd, p.n, p.qs)
    y_mx = ntt_mxu(xd, p.n, p.qs)
    assert np.array_equal(np.asarray(y_pl), np.asarray(y_mx))
    back = npk.intt_pallas(y_pl, p.n, p.qs)
    assert np.array_equal(np.asarray(back), x)


@pytest.mark.skipif(
    os.environ.get("ALCHEMY_PALLAS_NATIVE") != "1",
    reason="native Mosaic unavailable through the axon tunnel",
)
def test_pallas_ntt_native():
    from alchemy_tpu.backend.pallas.ntt_pallas import intt_pallas, ntt_pallas
    from alchemy_tpu.backend.ntt_mxu import ntt_mxu
    from alchemy_tpu.she.fast import FastParams

    p = FastParams.make(12, 4)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, p.n) for q in p.qs]).astype(np.uint32)
    xd = jnp.asarray(x)
    y = ntt_pallas(xd, p.n, p.qs)
    assert np.array_equal(np.asarray(y), np.asarray(ntt_mxu(xd, p.n, p.qs)))
    assert np.array_equal(np.asarray(intt_pallas(y, p.n, p.qs)), x)


def _patch_interpret_mr(monkeypatch):
    from jax.experimental import pallas as pl

    import alchemy_tpu.backend.pallas.mul_relin_pallas as mrk
    import alchemy_tpu.backend.pallas.ntt_pallas as npk

    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(npk.pl, "pallas_call", patched)
    monkeypatch.setattr(mrk.pl, "pallas_call", patched)
    return mrk


def test_pallas_mul_relin_interpret_bit_identical(monkeypatch):
    mrk = _patch_interpret_mr(monkeypatch)
    from alchemy_tpu.she import fast
    from alchemy_tpu.she.fast import FastParams

    p = FastParams.make(10, 3, impl="pallas")
    rng = np.random.default_rng(0)
    s = fast.keygen(p, rng)
    hb, ha = fast.relin_hint(p, s, rng)
    ct1 = fast.encrypt(p, s, rng.integers(0, p.zp, p.n), rng)
    ct2 = fast.encrypt(p, s, rng.integers(0, p.zp, p.n), rng)
    # the jnp 3-factor formulation is the reference for the Mosaic kernel
    # (same slot order; both must agree bit-for-bit)
    ref = fast._mul_relin_jnp(p, ct1, ct2, hb, ha)
    out = mrk.mul_relin_pallas(p, ct1, ct2, hb, ha)
    assert np.array_equal(np.asarray(ref), np.asarray(out))
    # Shoup hint pairs (the fast hint-product path): still bit-identical
    hsb = fast.shoup_precompute(hb, p.qs)
    hsa = fast.shoup_precompute(ha, p.qs)
    out_s = mrk.mul_relin_pallas(p, ct1, ct2, hsb, hsa)
    assert np.array_equal(np.asarray(ref), np.asarray(out_s))


def test_fast_impl_pallas_dispatch_and_decrypt(monkeypatch):
    """impl="pallas" routes through the fused kernel (interpret mode here)
    and the product still decrypts to the plaintext product."""
    mrk = _patch_interpret_mr(monkeypatch)
    from alchemy_tpu.she import fast
    from alchemy_tpu.she.fast import FastParams

    p = FastParams.make(10, 3, impl="pallas")
    rng = np.random.default_rng(1)
    s = fast.keygen(p, rng)
    hb, ha = fast.relin_hint(p, s, rng)
    m1 = rng.integers(0, p.zp, p.n)
    m2 = rng.integers(0, p.zp, p.n)
    ct1 = fast.encrypt(p, s, m1, rng)
    ct2 = fast.encrypt(p, s, m2, rng)
    out = fast.mul_relin(p, ct1, ct2, hb, ha)
    got = fast.decrypt(p, s, out)
    # negacyclic product of the plaintexts mod zp
    import numpy as _np
    n = p.n
    ref = _np.zeros(n, dtype=_np.int64)
    for i, c in enumerate(m1):
        if c == 0:
            continue
        ref[i:] += c * m2[: n - i]
        ref[: i] -= c * m2[n - i:]
    assert _np.array_equal(got, ref % p.zp)


def test_pallas_mul_relin_batched(monkeypatch):
    """The batched kernel (leading ct axis, chunked at MAX_BATCH) matches
    per-ciphertext calls bit-for-bit."""
    mrk = _patch_interpret_mr(monkeypatch)
    from alchemy_tpu.she import fast
    from alchemy_tpu.she.fast import FastParams

    p = FastParams.make(10, 3, impl="pallas")
    rng = np.random.default_rng(2)
    s = fast.keygen(p, rng)
    hb, ha = fast.relin_hint(p, s, rng)
    cts = [fast.encrypt(p, s, rng.integers(0, p.zp, p.n), rng)
           for _ in range(5)]                      # 5 > MAX_BATCH: chunks
    ct_b = fast.encrypt(p, s, rng.integers(0, p.zp, p.n), rng)
    batch_a = jnp.stack(cts)
    batch_b = jnp.stack([ct_b] * 5)
    out = mrk.mul_relin_pallas(p, batch_a, batch_b, hb, ha)
    for i in range(5):
        ref = mrk.mul_relin_pallas(p, cts[i], ct_b, hb, ha)
        assert np.array_equal(np.asarray(out[i]), np.asarray(ref)), i


def test_pallas_mul_relin_r4_interpret_bit_identical(monkeypatch):
    """The radix-4 kernel path (n = 128·128·4 = 2^16 — the top of the
    north-star NTT range) matches the jnp 3-factor formulation bit-for-bit
    (the r=4 DFT exploits i² = −1: one Shoup mult + 8 add/sub)."""
    mrk = _patch_interpret_mr(monkeypatch)
    from alchemy_tpu.she import fast
    from alchemy_tpu.she.fast import FastParams

    p = FastParams.make(16, 2, impl="pallas")
    rng = np.random.default_rng(7)
    s = fast.keygen(p, rng)
    hb, ha = fast.relin_hint(p, s, rng)
    ct1 = fast.encrypt(p, s, rng.integers(0, p.zp, p.n), rng)
    ct2 = fast.encrypt(p, s, rng.integers(0, p.zp, p.n), rng)
    ref = fast._mul_relin_jnp(p, ct1, ct2, hb, ha)
    out = mrk.mul_relin_pallas(p, ct1, ct2, hb, ha)
    assert np.array_equal(np.asarray(ref), np.asarray(out))


def test_mxu3_r4_roundtrip_and_product():
    """3-factor NTT at 2^16 (radix 4): exact roundtrip, and the negacyclic
    square agrees with the VPU butterfly transform's."""
    from alchemy_tpu.backend.ntt import intt_negacyclic, ntt_negacyclic
    from alchemy_tpu.backend.ntt_mxu3 import _split3, intt_mxu3, ntt_mxu3
    from alchemy_tpu.backend.xla import mulmod
    from alchemy_tpu.she.fast import FastParams

    assert _split3(1 << 16) == (128, 128, 4)
    p = FastParams.make(16, 2)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, p.n) for q in p.qs]).astype(np.uint32)
    xd = jnp.asarray(x)
    y = ntt_mxu3(xd, p.n, p.qs)
    assert np.array_equal(np.asarray(intt_mxu3(y, p.n, p.qs)), x)
    y2 = ntt_negacyclic(xd, p.n, p.qs)
    sq_mxu = intt_mxu3(mulmod(y, y, p.qs), p.n, p.qs)
    sq_vpu = intt_negacyclic(mulmod(y2, y2, p.qs), p.n, p.qs)
    assert np.array_equal(np.asarray(sq_mxu), np.asarray(sq_vpu))


def test_max_batch_vmem_cap():
    from alchemy_tpu.backend.pallas.mul_relin_pallas import max_batch

    assert max_batch(1 << 15, 8) == 4     # the north-star config keeps 4
    assert max_batch(1 << 14, 8) == 4
    assert max_batch(1 << 16, 8) == 1     # 2^16 runs one ct per fused call
    assert max_batch(1 << 16, 2) >= 1


def test_pallas_hybrid_mul_relin_interpret_bit_identical(monkeypatch):
    """The fused hybrid digit-NTT+hint kernel path matches the jnp hybrid
    formulation bit-for-bit (and still decrypts to the plaintext product)."""
    mrk = _patch_interpret_mr(monkeypatch)
    from alchemy_tpu.she import fast
    from alchemy_tpu.she.fast import FastParams
    from alchemy_tpu.she.hybrid import (
        HybridKS,
        _mul_relin_hybrid_pallas,
        hybrid_keygen_hint,
        mul_relin_hybrid,
    )

    p = FastParams.make(10, 4, zp=2, impl="pallas", bits=24)
    hk = HybridKS.make(p, bits=24)
    rng = np.random.default_rng(5)
    s, (hb, ha) = hybrid_keygen_hint(hk, rng)
    ct1 = fast.encrypt(p, s, rng.integers(0, 2, p.n), rng)
    ct2 = fast.encrypt(p, s, rng.integers(0, 2, p.n), rng)
    # n < 2^14, so mul_relin_hybrid takes the jnp path — the reference
    ref = mul_relin_hybrid(hk, ct1, ct2, hb, ha)
    out = _mul_relin_hybrid_pallas(hk, ct1, ct2, hb, ha)
    assert np.array_equal(np.asarray(ref), np.asarray(out))
    d1 = fast.decrypt(p, s, out)
    d2 = fast.decrypt(p, s, ref)
    assert np.array_equal(d1, d2)
    # Shoup hint pairs through the kernel path: still bit-identical
    hsb = fast.shoup_precompute(hb, hk.pe.qs)
    hsa = fast.shoup_precompute(ha, hk.pe.qs)
    out_s = _mul_relin_hybrid_pallas(hk, ct1, ct2, hsb, hsa)
    assert np.array_equal(np.asarray(ref), np.asarray(out_s))


def test_pallas_rescale_joint_interpret_bit_identical(monkeypatch):
    """The fused joint P-rescale kernels (backend/pallas/rescale_pallas.py —
    kernel C iNTT + δ-correction/P-division/forward-NTT kernel D) match the
    jnp formulation bit-for-bit."""
    _patch_interpret_mr(monkeypatch)
    from alchemy_tpu.backend.pallas.rescale_pallas import rescale_joint_pallas
    from alchemy_tpu.she.fast import FastParams
    from alchemy_tpu.she.hybrid import _rescale_joint_jnp

    p = FastParams.make(14, 6, zp=2, impl="pallas")
    rng = np.random.default_rng(3)
    ct = jnp.asarray(np.stack(
        [[rng.integers(0, q, p.n) for q in p.qs] for _ in range(2)]
    ).astype(np.uint32))                       # [2, T=6, n]
    ref = _rescale_joint_jnp(p, ct, 2)
    out = rescale_joint_pallas(p, ct, 2)
    assert np.array_equal(np.asarray(ref), np.asarray(out))
    # and via the dispatcher (impl="pallas" at 2^14 routes to the kernels)
    from alchemy_tpu.she.hybrid import rescale_joint

    out2 = rescale_joint(p, ct, 2)
    assert np.array_equal(np.asarray(ref), np.asarray(out2))


def test_pallas_hybrid_full_with_kernel_rescale(monkeypatch):
    """Full hybrid mul+relin at n=2^14 through ALL fused kernels (tensor
    product, hybrid digit stage, joint P-rescale) still decrypts to the
    plaintext product (the §4 differential oracle)."""
    _patch_interpret_mr(monkeypatch)
    from alchemy_tpu.she import fast
    from alchemy_tpu.she.fast import FastParams
    from alchemy_tpu.she.hybrid import (
        HybridKS,
        hybrid_keygen_hint,
        mul_relin_hybrid,
    )

    p = FastParams.make(14, 4, zp=2, impl="pallas")
    hk = HybridKS.make(p)
    rng = np.random.default_rng(11)
    s, (hb, ha) = hybrid_keygen_hint(hk, rng)
    m1 = rng.integers(0, 2, p.n)
    m2 = rng.integers(0, 2, p.n)
    ct1 = fast.encrypt(p, s, m1, rng)
    ct2 = fast.encrypt(p, s, m2, rng)
    out = mul_relin_hybrid(hk, ct1, ct2, hb, ha)
    # oracle: negacyclic convolution mod 2 (x^n = −1 ≡ +1 mod 2) — the
    # golden Cyc product at m = 2^15 is a dense transform, far too slow here
    conv = np.convolve(m1.astype(np.int64), m2.astype(np.int64))
    want = (np.concatenate([conv, [0]])[: p.n]
            + np.concatenate([conv[p.n:], np.zeros(1, np.int64)])) % 2
    assert np.array_equal(fast.decrypt(p, s, out), want)


def test_pallas_standalone_ntt3_bit_identical(monkeypatch):
    """The standalone fused 3-factor NTT kernels (ntt3/intt3_grid_pallas;
    the _ntt_p/_intt_p dispatch behind ALCHEMY_PALLAS_NTT=1 — default is
    the jnp path, measured faster on device) match ntt_mxu3/intt_mxu3
    bit-for-bit and round-trip."""
    monkeypatch.setenv("ALCHEMY_PALLAS_NTT", "1")
    _patch_interpret_mr(monkeypatch)
    from alchemy_tpu.backend.ntt_mxu3 import intt_mxu3, ntt_mxu3
    from alchemy_tpu.she.fast import FastParams, _intt_p, _ntt_p

    p = FastParams.make(14, 3, impl="pallas")
    rng = np.random.default_rng(9)
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, p.n) for q in p.qs]).astype(np.uint32))
    y = _ntt_p(p, x)
    assert np.array_equal(np.asarray(y), np.asarray(ntt_mxu3(x, p.n, p.qs)))
    assert np.array_equal(np.asarray(_intt_p(p, y)), np.asarray(x))
    # leading batch dims fold through the kernel path too
    xb = jnp.asarray(np.stack([np.asarray(x)] * 2))
    yb = _ntt_p(p, xb)
    assert np.array_equal(np.asarray(yb[0]), np.asarray(y))
    assert np.array_equal(np.asarray(intt_mxu3(yb, p.n, p.qs)),
                          np.asarray(xb))


def test_pallas_mul_relin_ctmajor_r2_bit_identical(monkeypatch):
    """The ct-major kernel B (grid over cts, limbs inner: hoisted planes,
    stacked stage-1, unreduced (lo, hi) twiddle via the T32 table) matches
    the jnp reference AND the limb-major kernel bit-for-bit at an r=2
    butterfly config with an odd limb count (uneven stage-1 limb groups)
    and a ciphertext batch."""
    mrk = _patch_interpret_mr(monkeypatch)
    from alchemy_tpu.she import fast
    from alchemy_tpu.she.fast import FastParams

    p = FastParams.make(11, 5, impl="pallas")   # A=B=32, r=2; L=5 odd
    rng = np.random.default_rng(3)
    s = fast.keygen(p, rng)
    hb, ha = fast.relin_hint(p, s, rng, shoup=True)
    cts = [fast.encrypt(p, s, rng.integers(0, p.zp, p.n), rng)
           for _ in range(3)]
    ca = jnp.stack(cts)
    cb = jnp.stack([cts[1], cts[2], cts[0]])
    ref = fast._mul_relin_jnp(p, ca, cb, hb, ha)
    out_ct = mrk.mul_relin_pallas(p, ca, cb, hb, ha)     # ct-major path
    assert np.array_equal(np.asarray(ref), np.asarray(out_ct))
    monkeypatch.setattr(mrk, "_KB_CTMAJOR", False)
    mrk._mul_relin_pallas_one.clear_cache()
    out_lm = mrk.mul_relin_pallas(p, ca, cb, hb, ha)     # limb-major path
    assert np.array_equal(np.asarray(out_ct), np.asarray(out_lm))
    monkeypatch.setattr(mrk, "_KB_CTMAJOR", True)
    mrk._mul_relin_pallas_one.clear_cache()


def test_fast_recombine_exact_at_bounds():
    """Property-pin the round-5 fast recombination (_recombine_sums_fast /
    _assemble_w0_m): for plane sums up to the WORST-CASE bounds of the
    paired digit-plane dots (s_f ≤ 4·K·255·255 for f ≤ 2, s_3 ≤
    4·K·255·63 — the scaled weights' top byte is < 64 for q < 2^30), the
    byte-serial assembly w0 + 2^16·m equals Σ_f 2^(8f)·s_f exactly and
    the canonical result matches the exact bigint residue, for K ∈
    {128, 256} and random ~30-bit NTT-style primes. Includes the exact
    extreme corner (all sums at their maxima)."""
    from alchemy_tpu.backend.pallas.ntt_pallas import (
        _assemble_w0_m,
        _recombine_sums_fast,
    )
    from alchemy_tpu.backend.xla import shoup_const

    rng = np.random.default_rng(12)
    for K in (128, 256):
        smax = 4 * K * 255 * 255
        s3max = 4 * K * 255 * 63
        qs = [((1 << 30) - rng.integers(1, 1 << 20)) | 1 for _ in range(3)]
        qs.append((1 << 30) - 1)                      # extreme q
        for q in map(int, qs):
            r16 = (1 << 16) % q
            r16s = shoup_const(r16, q)
            cols = 64
            s0 = rng.integers(0, smax + 1, cols).astype(np.uint64)
            s1 = rng.integers(0, smax + 1, cols).astype(np.uint64)
            s2 = rng.integers(0, smax + 1, cols).astype(np.uint64)
            s3 = rng.integers(0, s3max + 1, cols).astype(np.uint64)
            # corner: every sum at its max simultaneously
            s0[0], s1[0], s2[0], s3[0] = smax, smax, smax, s3max
            sums = [jnp.asarray(s.astype(np.uint32)) for s in (s0, s1, s2, s3)]
            value = (s0.astype(object) + (s1.astype(object) << 8)
                     + (s2.astype(object) << 16) + (s3.astype(object) << 24))
            w0, m = _assemble_w0_m(sums)
            w0n = np.asarray(w0).astype(object)
            mn = np.asarray(m).astype(object)
            assert all(w0n[i] + (mn[i] << 16) == value[i] for i in range(cols))
            got = np.asarray(_recombine_sums_fast(
                sums, np.uint32(q), np.uint32(r16), np.uint32(r16s),
                canonical=True))
            want = np.array([int(v) % q for v in value], dtype=np.uint32)
            assert np.array_equal(got, want), (q, K)
            # non-canonical: congruent mod q and strictly below 2q + 2^16
            raw = np.asarray(_recombine_sums_fast(
                sums, np.uint32(q), np.uint32(r16), np.uint32(r16s)))
            assert np.all((raw.astype(np.int64) - want.astype(np.int64)) % q == 0)
            assert int(raw.max()) < 2 * q + (1 << 16)
