"""Pallas TPU kernel: fused BGV ciphertext multiply + relinearization.

The jnp/XLA formulation of the hot op (she/fast.py mul_relin) is HBM-bound:
of ~430 us device time at the north-star config (n=2^15, L=8) only ~55 us is
MXU matmuls — the rest is elementwise fusions shuttling the [D, L, n] digit
tensor, its bf16 digit planes, and the plane sums through HBM between XLA
fusions. This kernel keeps the whole relinearization dataflow VMEM-resident:

  kernel A (grid over limbs d):  c0/c1/c2 tensor product (Karatsuba-free
      general modmuls — exact canonical residues, so bit-identical to the
      jnp path regardless of association) and the inverse NTT of c2 to
      coefficients, one limb per program.
  kernel B (grid over output limbs l): for each gadget digit d (= limb d of
      the c2 coefficients, entering UNREDUCED mod q_l — the digit-plane
      matmul reduces any uint32 exactly at recombination, DESIGN.md), the
      forward NTT under limb l's tables, the hint products, and the
      accumulation into (out0, out1) all happen in VMEM; HBM sees each hint
      slice exactly once (raw u32 values — no Shoup companion stream, the
      general in-VMEM modmul is cheaper than doubling the hint read).

Semantics identical to she/fast.py mul_relin (reference: the key-switch /
relinearization dataflow of SymmSHE `keySwitchQuadCirc`, consumed at
/root/reference Crypto/Alchemy/Interpreter/Eval.hs:126,133); outputs are
bit-identical to the jnp MXU path (tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alchemy_tpu.backend.pallas.ntt_pallas import (
    _M16,
    _mod_matmul,
    _mulhi,
    _pallas_tables,
    _planes,
    _reduce_u32,
    _shoup,
)

U32 = jnp.uint32


def _mulmod_gen(a, b, q, r16, r16s, r32, r32s):
    """General a·b mod q for canonical a, b < q < 2^31 (exact; same residue
    as backend/xla._mulmod_arrays)."""
    a0, a1 = a & _M16, a >> np.uint32(16)
    b0, b1 = b & _M16, b >> np.uint32(16)
    p01 = a0 * b1
    mid = p01 + a1 * b0
    carry_mid = (mid < p01).astype(U32)
    lo = a0 * b0 + (mid << np.uint32(16))
    carry_lo = (lo < a0 * b0).astype(U32)
    hi = a1 * b1 + (mid >> np.uint32(16)) + (carry_mid << np.uint32(16)) + carry_lo
    t1 = _shoup(hi, r32, r32s, q)
    t2 = _reduce_u32(lo, q, r16, r16s)
    out = t1 + t2
    return jnp.where(out >= q, out - q, out)


def _addmod(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def _submod(a, b, q):
    return jnp.where(a >= b, a - b, a + q - b)


def _tensor_intt_kernel(scalars_ref, a0_ref, a1_ref, b0_ref, b1_ref,
                        w2it_ref, itw_ref, itw_s_ref, w1i_ref,
                        c0_ref, c1_ref, c2c_ref):
    """Per-limb tensor product (c0, c1) and iNTT(c2) → coefficients."""
    l = pl.program_id(0)
    q = scalars_ref[l, 0]
    r16 = scalars_ref[l, 1]
    r16s = scalars_ref[l, 2]
    r32 = scalars_ref[l, 3]
    r32s = scalars_ref[l, 4]
    a0, a1 = a0_ref[0], a1_ref[0]
    b0, b1 = b0_ref[0], b1_ref[0]
    mm = lambda x, y: _mulmod_gen(x, y, q, r16, r16s, r32, r32s)
    c0 = mm(a0, b0)
    c2 = mm(a1, b1)
    cross = mm(_addmod(a0, a1, q), _addmod(b0, b1, q))
    c1 = _submod(cross, _addmod(c0, c2, q), q)
    c0_ref[0] = c0
    c1_ref[0] = c1
    # inverse NTT of c2 ((k1,k2) grid in, natural (j1,j2) out)
    z = _mod_matmul(_planes(c2),
                    [[w2it_ref[0, d, f] for f in range(4)] for d in range(4)],
                    q, r16, r16s, r32, r32s, left=False)
    z = _shoup(z, itw_ref[0], itw_s_ref[0], q)
    y = _mod_matmul(_planes(z),
                    [[w1i_ref[0, d, f] for f in range(4)] for d in range(4)],
                    q, r16, r16s, r32, r32s, left=True)
    n2 = y.shape[1]
    c2c_ref[:, pl.ds(l * n2, n2)] = y


def _digit_relin_kernel(ndig_ref, scalars_ref, c2c_ref, c0_ref, c1_ref,
                        w1_ref, tw_ref, tw_s_ref, w2t_ref,
                        hb_ref, ha_ref, out_ref, *, ndig: int):
    """Per-output-limb digit NTTs + hint inner product, VMEM-resident.

    All `ndig` digits go through each matmul stage as ONE wide dot so the
    MXU runs at full tilt: stage 1 contracts j1 with the digit axis packed
    into the columns ([n1, n1] @ [n1, D·n2]); stage 2 contracts j2 with the
    digit axis packed into the rows ([D·n1, n2] @ [n2, n2]); the (cols →
    rows) digit move between stages is a VMEM-local axis swap. Digit planes
    are extracted once per output limb for the whole digit block."""
    del ndig_ref
    l = pl.program_id(0)
    q = scalars_ref[l, 0]
    r16 = scalars_ref[l, 1]
    r16s = scalars_ref[l, 2]
    r32 = scalars_ref[l, 3]
    r32s = scalars_ref[l, 4]
    w1 = [[w1_ref[0, d, f] for f in range(4)] for d in range(4)]
    w2t = [[w2t_ref[0, d, f] for f in range(4)] for d in range(4)]
    tw, tws = tw_ref[0], tw_s_ref[0]
    D = ndig
    n1 = c2c_ref.shape[0]
    n2 = c2c_ref.shape[1] // D
    # c2c arrives digit-major in the lane axis (n1, D·n2): all D digits go
    # through the j1 contraction as ONE wide dot ([n1,n1] @ [n1, D·n2])
    x = c2c_ref[...]
    y = _mod_matmul(_planes(x), w1, q, r16, r16s, r32, r32s, left=True)
    out0 = c0_ref[0]
    out1 = c1_ref[0]
    for d in range(D):
        yd = _shoup(y[:, d * n2:(d + 1) * n2], tw, tws, q)
        zd = _mod_matmul(_planes(yd), w2t, q, r16, r16s, r32, r32s, left=False)
        out0 = _addmod(out0, _mulmod_gen(zd, hb_ref[d, 0], q, r16, r16s, r32, r32s), q)
        out1 = _addmod(out1, _mulmod_gen(zd, ha_ref[d, 0], q, r16, r16s, r32, r32s), q)
    out_ref[0, 0] = out0
    out_ref[1, 0] = out1


def _limb_spec(shape):
    return pl.BlockSpec((1, *shape), lambda l: (l, *([0] * len(shape))),
                        memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda l: tuple([0] * len(shape)),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnums=(0,))
def mul_relin_pallas(p, ct_a, ct_b, hint_b, hint_a):
    """Fused multiply+relinearize, [2, L, n] cts (NTT domain), raw u32 hints
    [L, L, n]. Bit-identical to she/fast.mul_relin on the same inputs."""
    n, qs = p.n, p.qs
    L = len(qs)
    t = _pallas_tables(n, qs)
    n1, n2 = t["n1"], t["n2"]
    g = (L, n1, n2)
    a0 = ct_a[0].reshape(g)
    a1 = ct_a[1].reshape(g)
    b0 = ct_b[0].reshape(g)
    b1 = ct_b[1].reshape(g)
    smem = pl.BlockSpec((L, 5), lambda l: (0, 0), memory_space=pltpu.SMEM)

    c0, c1, c2c = pl.pallas_call(
        _tensor_intt_kernel,
        grid=(L,),
        in_specs=[
            smem,
            _limb_spec((n1, n2)), _limb_spec((n1, n2)),
            _limb_spec((n1, n2)), _limb_spec((n1, n2)),
            _limb_spec((4, 4, n2, n2)),
            _limb_spec((n1, n2)), _limb_spec((n1, n2)),
            _limb_spec((4, 4, n1, n1)),
        ],
        out_specs=[
            _limb_spec((n1, n2)), _limb_spec((n1, n2)),
            _full_spec((n1, L * n2)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(g, jnp.uint32),
            jax.ShapeDtypeStruct(g, jnp.uint32),
            jax.ShapeDtypeStruct((n1, L * n2), jnp.uint32),
        ],
    )(t["scal"], a0, a1, b0, b1, t["w2it"], t["itw"], t["itw_s"], t["w1i"])

    # hints arrive [D, L, n]; slice per output limb l → block (D, 1, n1, n2)
    hb = hint_b.reshape(L, L, n1, n2)
    ha = hint_a.reshape(L, L, n1, n2)
    dig_spec = pl.BlockSpec((L, 1, n1, n2), lambda l: (0, l, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_digit_relin_kernel, ndig=L),
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dummy scalar (keeps sig stable)
            smem,
            _full_spec((n1, L * n2)),                # all digit coefficient rows
            _limb_spec((n1, n2)), _limb_spec((n1, n2)),
            _limb_spec((4, 4, n1, n1)),
            _limb_spec((n1, n2)), _limb_spec((n1, n2)),
            _limb_spec((4, 4, n2, n2)),
            dig_spec, dig_spec,
        ],
        out_specs=pl.BlockSpec((2, 1, n1, n2), lambda l: (0, l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, L, n1, n2), jnp.uint32),
    )(np.zeros((1,), np.int32), t["scal"], c2c, c0, c1,
      t["w1"], t["tw"], t["tw_s"], t["w2t"], hb, ha)
    return out.reshape(2, L, n)
