"""Hybrid key-switching (she/hybrid.py): Garner lifting, joint rescale, and
the fused hybrid mul+relin, pinned by the decrypt-equals-plaintext oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from alchemy_tpu.backend import golden_backend
from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.she import fast
from alchemy_tpu.she.fast import FastParams
from alchemy_tpu.she.hybrid import (
    HybridKS,
    extend_digits,
    garner_digits,
    hybrid_keygen_hint,
    mul_relin_hybrid,
    pick_dnum,
    rescale_joint,
)

GB = golden_backend()


def test_garner_lift_exact():
    chain = (97, 113, 193)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 97 * 113 * 193, 64, dtype=np.int64)
    res = jnp.asarray(np.stack([vals % g for g in chain]).astype(np.uint32))
    xs = garner_digits(res, chain)
    # V = sum x_k * pi_k, exact
    pi = [1, 97, 97 * 113]
    xs_np = [np.asarray(x).astype(np.int64) for x in xs]
    lifted = sum(x * p for x, p in zip(xs_np, pi))
    assert np.array_equal(lifted, vals)
    # extension to unrelated targets
    targets = (257, 241)
    ext = np.asarray(extend_digits(xs, chain, targets)).astype(np.int64)
    for t_i, t in enumerate(targets):
        assert np.array_equal(ext[t_i], vals % t)


def test_rescale_joint_matches_iterated():
    p = FastParams.make(5, 4, zp=2)
    rng = np.random.default_rng(1)
    s = fast.keygen(p, rng)
    msg = rng.integers(0, 2, p.n)
    ct = fast.encrypt(p, s, msg, rng)
    out_j = rescale_joint(p, ct, 2)
    p2 = FastParams(n=p.n, qs=p.qs[:2], zp=2, impl=p.impl)
    # same plaintext after dropping two limbs jointly
    dec = fast.decrypt(p2, s[:2], out_j)
    assert np.array_equal(dec, msg)
    # k_drop=1 agrees bit-exactly with the iterated rescale
    assert np.array_equal(
        np.asarray(rescale_joint(p, ct, 1)), np.asarray(fast.rescale(p, ct, 1))
    )


@pytest.mark.parametrize("dnum", [2, 4])
def test_hybrid_mul_relin_decrypts(dnum):
    p = FastParams.make(5, 8, zp=2, bits=24)
    hk = HybridKS.make(p, dnum=dnum, bits=24)
    rng = np.random.default_rng(2 + dnum)
    s, (hb, ha) = hybrid_keygen_hint(hk, rng)
    m1 = rng.integers(0, 2, p.n)
    m2 = rng.integers(0, 2, p.n)
    ct1 = fast.encrypt(p, s, m1, rng)
    ct2 = fast.encrypt(p, s, m2, rng)
    out = mul_relin_hybrid(hk, ct1, ct2, hb, ha)
    mm = 2 * p.n
    c1 = Cyc.from_coeffs(mm, (2,), m1, GB)
    c2 = Cyc.from_coeffs(mm, (2,), m2, GB)
    want = GB.to_numpy((c1 * c2).to_pow().data)[0]
    assert np.array_equal(fast.decrypt(p, s, out), want)


def test_hybrid_matches_trivgad_plaintext():
    """Hybrid and TrivGad relinearization agree on the decrypted product
    (ciphertext bits differ — different KS noise — the plaintext must not)."""
    p = FastParams.make(5, 4, zp=2, bits=24)
    hk = HybridKS.make(p, bits=24)
    rng = np.random.default_rng(7)
    s, (hb, ha) = hybrid_keygen_hint(hk, rng)
    tb, ta = fast.relin_hint(p, s, np.random.default_rng(8))
    m1 = rng.integers(0, 2, p.n)
    m2 = rng.integers(0, 2, p.n)
    ct1 = fast.encrypt(p, s, m1, rng)
    ct2 = fast.encrypt(p, s, m2, rng)
    d_h = fast.decrypt(p, s, mul_relin_hybrid(hk, ct1, ct2, hb, ha))
    d_t = fast.decrypt(p, s, fast.mul_relin(p, ct1, ct2, tb, ta))
    assert np.array_equal(d_h, d_t)


def test_hybrid_batched():
    p = FastParams.make(5, 4, zp=2, bits=24)
    hk = HybridKS.make(p, bits=24)
    rng = np.random.default_rng(9)
    s, (hb, ha) = hybrid_keygen_hint(hk, rng)
    msgs = [rng.integers(0, 2, p.n) for _ in range(3)]
    cts = jnp.stack([fast.encrypt(p, s, m, rng) for m in msgs])
    out = mul_relin_hybrid(hk, cts, cts, hb, ha)
    assert out.shape == cts.shape
    mm = 2 * p.n
    for i, m in enumerate(msgs):
        c = Cyc.from_coeffs(mm, (2,), m, GB)
        want = GB.to_numpy((c * c).to_pow().data)[0]
        assert np.array_equal(fast.decrypt(p, s, out[i]), want)


def test_pick_dnum():
    assert pick_dnum(8) == 2
    assert pick_dnum(16) == 4
    assert pick_dnum(3) == 1


def test_deep_circuit_hybrid():
    """Depth-4 squaring chain with hybrid relinearization per level
    (the BASELINE configs[3] workload shape)."""
    from alchemy_tpu.examples.deep_circuit import run

    ok, _ = run(log_n=5, depth=4, verbose=False, ks="hybrid")
    assert ok


def test_hybrid_explicit_dnum_normalized():
    """A caller-supplied dnum that exceeds the group count must be
    normalized (ADVICE r2: clamped jnp indexing silently double-counted the
    last digit and decrypted WRONG) — and still decrypt correctly."""
    p = FastParams.make(5, 4, zp=2, bits=24)
    hk = HybridKS.make(p, dnum=3, bits=24)
    assert hk.dnum == len(hk.groups)
    rng = np.random.default_rng(11)
    s, (hb, ha) = hybrid_keygen_hint(hk, rng)
    m1 = rng.integers(0, 2, p.n)
    m2 = rng.integers(0, 2, p.n)
    ct1 = fast.encrypt(p, s, m1, rng)
    ct2 = fast.encrypt(p, s, m2, rng)
    out = mul_relin_hybrid(hk, ct1, ct2, hb, ha)
    mm = 2 * p.n
    c1 = Cyc.from_coeffs(mm, (2,), m1, GB)
    c2 = Cyc.from_coeffs(mm, (2,), m2, GB)
    want = GB.to_numpy((c1 * c2).to_pow().data)[0]
    assert np.array_equal(fast.decrypt(p, s, out), want)


def test_hybrid_default_bits_cover_chain():
    """Default special-modulus width follows the chain's prime width so the
    hybrid noise condition P >= max Q_j holds (ADVICE r2)."""
    p = FastParams.make(5, 4, zp=2, bits=24)
    hk = HybridKS.make(p)
    assert all(g.bit_length() >= max(q.bit_length() for q in p.qs)
               for g in hk.ps)
    maxQ = 1
    for grp in hk.groups:
        Qj = 1
        for g in grp:
            Qj *= g
        maxQ = max(maxQ, Qj)
    P = 1
    for g in hk.ps:
        P *= g
    assert P >= maxQ


def test_rescale_joint_rejects_wide_zp():
    p = FastParams.make(5, 4, zp=2, bits=24)
    with pytest.raises(ValueError):
        rescale_joint(
            FastParams(n=p.n, qs=p.qs, zp=1 << 17, impl=p.impl),
            jnp.zeros((2, 4, p.n), jnp.uint32), 1)


def test_hybrid_gadget_compiled_pt2ct():
    """VERDICT r2 #7: a PT2CT-compiled program relinearizing with HybridGad
    (the per-gadget KSPNoise slot, PT2CT.hs:136-140) decrypts correctly —
    on golden and on the checked (XLA-vs-golden bit-identity) backend,
    which also exercises the new hybrid_digit_rows backend op."""
    from alchemy_tpu.backend import get_backend
    from alchemy_tpu.core.cyc import Cyc
    from alchemy_tpu.core.params import RnsChain
    from alchemy_tpu.interp.eval import eval_ir
    from alchemy_tpu.interp.keys_hints import KeysHints
    from alchemy_tpu.interp.noise import KS_ACCUM_PNOISE, NoiseLedger, PtTy
    from alchemy_tpu.interp.pt2ct import pt2ct
    from alchemy_tpu.lang.dsl import lam2
    from alchemy_tpu.nt.factor import totient
    from alchemy_tpu.she.gadget import BaseBGad, HybridGad

    M, M_PRIME, ZP = 4, 512, 8
    ZQS = RnsChain([268440577, 8392193, 1073750017])
    PT = PtTy(pnoise=0, m=M, zp=ZP)
    addMul = lam2(lambda x, y: (x + y) * y)

    # ledger: hybrid is charged like BaseBGad (digit magnitude cancels
    # against P) — no TrivGad 32-bit digit penalty
    led = NoiseLedger(ZQS)
    assert led.ks_pnoise(HybridGad(), 0) == led.ks_pnoise(BaseBGad(2), 0)
    assert led.ks_pnoise(HybridGad(), 0) == KS_ACCUM_PNOISE

    for backend in ("golden", "checked"):
        bk = get_backend(backend)
        rng = np.random.default_rng(1)
        pt1 = Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), bk)
        pt2 = Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), bk)
        ptresult = eval_ir(addMul, pt1, pt2)
        ctx = KeysHints(3.0, seed=1, bk=bk)
        compiled = pt2ct(addMul, res_ty=PT, m_map={M: M_PRIME}, zqs=ZQS,
                         gad=HybridGad(dnum=2), ctx=ctx)
        arg1 = compiled.encrypt_arg(pt1, 0)
        arg2 = compiled.encrypt_arg(pt2, 1)
        dec = compiled.decrypt(eval_ir(compiled.ir, arg1, arg2))
        assert dec is not None and dec.equals(ptresult), backend


def test_hybrid_gadget_tunnel_rejected():
    """HybridGad is a relinearization gadget; tunneling must fail loudly."""
    from alchemy_tpu.she.gadget import HybridGad
    from alchemy_tpu.she.tunnel import tunnel_hint

    with pytest.raises(TypeError, match="HybridGad"):
        tunnel_hint(None, None, None, HybridGad(), (17,), 2, None, None)
