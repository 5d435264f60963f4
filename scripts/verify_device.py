#!/usr/bin/env python
"""Native-Mosaic kernel correctness ON THE REAL DEVICE (VERDICT r3 weak #4:
the pytest suite runs every Pallas kernel in interpreter mode on CPU, so a
Mosaic compiler regression would surface as a wrong benchmark, not a red
test). `run_checks()` executes every fused kernel natively and compares
bit-for-bit against the jnp/XLA formulation in the same NTT slot order
(which the tests pin against the golden model); bench.py embeds the result
in the driver's BENCH_r{N}.json, so kernel regressions fail loudly in the
round artifacts.

Standalone: python scripts/verify_device.py  → prints the dict, exit 1 on
any failure. Configs: n=2^14/L=4-8 for the kernel-family checks, PLUS one
check at the exact bench headline config (n=2^15, L=8, Bt=16, Shoup hint
pairs, 100 MB VMEM cap) so the recorded PASS guards the recorded number
(VERDICT r4 weak #4). The persistent compile cache (/tmp/alchemy_jax_cache)
makes reruns fast.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_checks() -> dict:
    import jax.numpy as jnp
    import numpy as np

    from alchemy_tpu.she import fast
    from alchemy_tpu.she.fast import FastParams, _mul_relin_jnp

    results = {}
    rng = np.random.default_rng(0)

    # 1. fused mul+relin kernel pair (A + digit-chunked B) vs the jnp
    #    formulation (same 3-factor slot order), plus the decrypt oracle
    p = FastParams.make(14, 4, zp=2, impl="pallas")
    s = fast.keygen(p, rng)
    hb, ha = fast.relin_hint(p, s, rng, shoup=False)
    m1 = rng.integers(0, p.zp, p.n)
    m2 = rng.integers(0, p.zp, p.n)
    ct1 = fast.encrypt(p, s, m1, rng)
    ct2 = fast.encrypt(p, s, m2, rng)
    got = fast.mul_relin(p, ct1, ct2, hb, ha)          # Mosaic kernels
    want = _mul_relin_jnp(p, ct1, ct2, hb, ha)         # jnp, same domain
    results["mul_relin_bitident"] = bool(
        np.array_equal(np.asarray(got), np.asarray(want)))
    hsb = fast.shoup_precompute(hb, p.qs)
    hsa = fast.shoup_precompute(ha, p.qs)
    got_s = fast.mul_relin(p, ct1, ct2, hsb, hsa)      # shoup hint-pair path
    results["mul_relin_shoup_bitident"] = bool(
        np.array_equal(np.asarray(got_s), np.asarray(want)))
    dec = np.asarray(fast.decrypt(p, s, got))
    conv = np.convolve(m1, m2)                      # negacyclic ring product
    ring_prod = conv[:p.n].copy()
    ring_prod[:p.n - 1] -= conv[p.n:]
    results["mul_relin_decrypt"] = bool(
        np.array_equal(dec, ring_prod % p.zp))

    # 2. hybrid fused path (kernel A + hybrid digit kernel) vs jnp
    from alchemy_tpu.she.hybrid import (
        HybridKS,
        _mul_relin_hybrid_jnp,
        _mul_relin_hybrid_pallas,
        hybrid_keygen_hint,
    )

    p8 = FastParams.make(14, 8, zp=2, impl="pallas")
    hk = HybridKS.make(p8)
    s8, (hhb, hha) = hybrid_keygen_hint(hk, rng)
    c1 = fast.encrypt(p8, s8, rng.integers(0, 2, p8.n), rng)
    c2 = fast.encrypt(p8, s8, rng.integers(0, 2, p8.n), rng)
    got_h = _mul_relin_hybrid_pallas(hk, c1, c2, hhb, hha)
    want_h = _mul_relin_hybrid_jnp(hk, c1, c2, hhb, hha)
    results["hybrid_bitident"] = bool(
        np.array_equal(np.asarray(got_h), np.asarray(want_h)))
    hsb_h = fast.shoup_precompute(hhb, hk.pe.qs)
    hsa_h = fast.shoup_precompute(hha, hk.pe.qs)
    got_hs = _mul_relin_hybrid_pallas(hk, c1, c2, hsb_h, hsa_h)
    results["hybrid_shoup_bitident"] = bool(
        np.array_equal(np.asarray(got_hs), np.asarray(want_h)))

    # 3. joint P-rescale kernels vs jnp (same FastParams → same domain)
    from alchemy_tpu.she.hybrid import _rescale_joint_jnp, rescale_joint

    pe = hk.pe
    x = np.stack([
        np.stack([rng.integers(0, q, pe.n) for q in pe.qs])
        for _ in range(2)
    ]).astype(np.uint32)
    got_r = rescale_joint(pe, jnp.asarray(x), len(hk.ps))   # kernel C/D
    want_r = _rescale_joint_jnp(pe, jnp.asarray(x), len(hk.ps))
    results["rescale_joint_bitident"] = bool(
        np.array_equal(np.asarray(got_r), np.asarray(want_r)))

    # 4. standalone 3-factor grid kernels vs the jnp MXU formulation
    from alchemy_tpu.backend.ntt_mxu3 import ntt_mxu3
    from alchemy_tpu.backend.pallas.rescale_pallas import (
        intt3_grid_pallas,
        ntt3_grid_pallas,
    )

    rows = np.stack([
        np.stack([rng.integers(0, q, p8.n) for q in p8.qs])
        for _ in range(2)
    ]).astype(np.uint32)
    fwd = ntt3_grid_pallas(p8.n, p8.qs, jnp.asarray(rows))
    fwd_j = ntt_mxu3(jnp.asarray(rows), p8.n, p8.qs)
    back = intt3_grid_pallas(p8.n, p8.qs, fwd)
    results["ntt3_grid_bitident"] = bool(
        np.array_equal(np.asarray(fwd), np.asarray(fwd_j)))
    results["ntt3_grid_roundtrip"] = bool(
        np.array_equal(np.asarray(back), rows))

    # 5. the EXACT headline bench config (VERDICT r4 weak #4): n=2^15, L=8,
    #    Bt=16 fused batch, Shoup hint pairs, raised 100 MB VMEM cap — a
    #    Mosaic regression specific to the r=2 grid, the Bt=16 batch path,
    #    or the raised-cap compile must fail HERE, not surface as a perf
    #    anomaly in BENCH_r{N}.json.
    p15 = FastParams.make(15, 8, zp=2, impl="pallas")
    s15 = fast.keygen(p15, rng)
    hb15, ha15 = fast.relin_hint(p15, s15, rng, shoup=True)
    cta = np.stack([np.asarray(fast.encrypt(
        p15, s15, rng.integers(0, 2, p15.n), rng)) for _ in range(16)])
    ctb = np.stack([np.asarray(fast.encrypt(
        p15, s15, rng.integers(0, 2, p15.n), rng)) for _ in range(16)])
    cta, ctb = jnp.asarray(cta), jnp.asarray(ctb)
    got16 = fast.mul_relin(p15, cta, ctb, hb15, ha15)   # Bt=16 fused Mosaic
    want16 = _mul_relin_jnp(p15, cta, ctb, hb15, ha15)
    results["headline_n2e15_L8_Bt16_shoup_bitident"] = bool(
        np.array_equal(np.asarray(got16), np.asarray(want16)))

    results["pass"] = all(v for k, v in results.items() if k != "pass")
    return results


def main() -> None:
    import json

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/alchemy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    res = run_checks()
    print(json.dumps(res, indent=1))
    raise SystemExit(0 if res["pass"] else 1)


if __name__ == "__main__":
    main()
