"""Pallas TPU kernels: fused joint P-rescale for hybrid key-switching.

she/hybrid.rescale_joint is the hybrid path's tail cost: 2·(L+K) inverse and
2·L forward limb transforms per op, which through the jnp/XLA formulation
shuttle every intermediate through HBM (the same bound the fused mul+relin
kernels removed — mul_relin_pallas.py). These kernels keep the transforms
VMEM-resident with the 3-factor MXU NTT:

  kernel C (grid over extended limbs t): inverse NTT of the accumulator
      rows (t0, t1) to coefficients — the iNTT section of kernel A.
  (host jnp, elementwise-cheap): Garner mixed-radix digits of the K dropped
      rows, sign flags and the mod-zp correction term — EXACTLY the code of
      she/hybrid.rescale_joint, so results stay bit-identical.
  kernel D (grid over keep limbs j): base-extension Σ_k x_k·[π_k]_{q_j}
      from SMEM constants, the centered correction δ, the exact division by
      P (Shoup), and the forward NTT — all in VMEM; HBM sees each row once.

Semantics: the exact BGV rescale by P = ∏ dropped limbs (reference:
SymmSHE modSwitch, /root/reference Crypto/Alchemy/Interpreter/Eval.hs:123,
applied at the hybrid switch's P-division); bit-identical to
she/hybrid.rescale_joint (tests/test_pallas.py)."""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alchemy_tpu.backend.pallas.mul_relin_pallas import (
    _addmod,
    _dft4,
    _full_spec,
    _limb_spec,
    _pallas3_tables,
    _submod,
)
from alchemy_tpu.backend.pallas.ntt_pallas import _mod_matmul, _planes, _shoup
from alchemy_tpu.backend.xla import shoup_const

U32 = jnp.uint32


def _batch_limb_spec(g, shape):
    return pl.BlockSpec((g, 1, *shape), lambda l: (0, l, *([0] * len(shape))),
                        memory_space=pltpu.VMEM)


def _intt_grid_kernel(scalars_ref, x_ref, *rest_refs, r: int, B: int, g: int,
                      use_bd: bool = False):
    """Per-limb 3-factor inverse NTT of [g, T, A, Br] rows (the iNTT section
    of mul_relin_pallas._tensor_intt_kernel, bit-identical to intt_mxu3).
    MXU dots widened like kernel A's: stage 3 batches all g rows (and at
    r ≤ 2 all k3 blocks via the block-diagonal matrix) into one dot; the
    stage-1 left dot runs once per row over all j3 blocks."""
    nw2 = 1 if use_bd else r
    w2_refs = rest_refs[:nw2]
    ti_ref, ti_s_ref, w1i_ref = (rest_refs[nw2], rest_refs[nw2 + 1],
                                 rest_refs[nw2 + 2])
    out_ref = rest_refs[nw2 + 3]
    l = pl.program_id(0)
    q = scalars_ref[l, 0]
    r16 = scalars_ref[l, 1]
    r16s = scalars_ref[l, 2]
    r32 = scalars_ref[l, 3]
    r32s = scalars_ref[l, 4]
    w1i = [[w1i_ref[0, d, f] for f in range(4)] for d in range(4)]
    w2 = [
        [[w2_refs[k][0, d, f] for f in range(4)] for d in range(4)]
        for k in range(nw2)
    ]
    xs = [x_ref[gi, 0] for gi in range(g)]
    A = xs[0].shape[0]
    if use_bd:
        X = jnp.concatenate(xs, axis=0) if g > 1 else xs[0]
        Z = _mod_matmul(_planes(X), w2[0], q, r16, r16s, r32, r32s,
                        left=False)
        blocks = [Z[:, k3 * B:(k3 + 1) * B] for k3 in range(r)]
    else:
        blocks = []
        for k3 in range(r):
            X = jnp.concatenate(
                [x[:, k3 * B:(k3 + 1) * B] for x in xs], axis=0) \
                if g > 1 else xs[0][:, k3 * B:(k3 + 1) * B]
            blocks.append(_mod_matmul(_planes(X), w2[k3],
                                      q, r16, r16s, r32, r32s, left=False))
    if r == 2:
        blocks = [_addmod(blocks[0], blocks[1], q),
                  _submod(blocks[0], blocks[1], q)]
    elif r == 4:
        blocks = _dft4(blocks, scalars_ref[l, 7], scalars_ref[l, 8], q)
    for gi in range(g):
        y_cat = jnp.concatenate([
            _shoup(blocks[j3][gi * A:(gi + 1) * A, :],
                   ti_ref[0][:, j3 * B:(j3 + 1) * B],
                   ti_s_ref[0][:, j3 * B:(j3 + 1) * B], q)
            for j3 in range(r)
        ], axis=1) if r > 1 else _shoup(
            blocks[0][gi * A:(gi + 1) * A, :], ti_ref[0], ti_s_ref[0], q)
        z = _mod_matmul(_planes(y_cat), w1i, q, r16, r16s, r32, r32s,
                        left=True)
        out_ref[gi, 0] = z


@partial(jax.jit, static_argnums=(0, 1))
def intt3_grid_pallas(n: int, qs: tuple[int, ...], x):
    """[G, T, A·Br] NTT-domain rows → coefficients (3-factor slot order),
    bit-identical to backend/ntt_mxu3.intt_mxu3 on the same rows."""
    t = _pallas3_tables(n, qs)
    A, B, r = t["A"], t["B"], t["r"]
    Br = B * r
    T = len(qs)
    G = x.shape[0]
    smem = pl.BlockSpec((T, 9), lambda l: (0, 0), memory_space=pltpu.SMEM)
    use_bd = t["w2if_bd"] is not None
    if use_bd:
        w2_tabs = (t["w2if_bd"],)
        w2_specs = [_limb_spec((4, 4, Br, Br))]
    else:
        w2_tabs = tuple(t["w2if"])
        w2_specs = [_limb_spec((4, 4, B, B)) for _ in range(r)]
    out = pl.pallas_call(
        partial(_intt_grid_kernel, r=r, B=B, g=G, use_bd=use_bd),
        grid=(T,),
        in_specs=[
            smem,
            _batch_limb_spec(G, (A, Br)),
            *w2_specs,
            _limb_spec((A, Br)), _limb_spec((A, Br)),
            _limb_spec((4, 4, A, A)),
        ],
        out_specs=_batch_limb_spec(G, (A, Br)),
        out_shape=jax.ShapeDtypeStruct((G, T, A, Br), jnp.uint32),
    )(t["scal"], x.reshape(G, T, A, Br), *w2_tabs, t["Ti"], t["Ti_s"],
      t["w1i"])
    return out.reshape(G, T, n)


def _ntt_grid_kernel(scalars_ref, x_ref, w1_ref, t_ref, t_s_ref, *rest_refs,
                     r: int, B: int, g: int):
    """Per-limb 3-factor forward NTT of [g, T, A, Br] coefficient rows
    (the forward-stage structure of _digit_relin_kernel with one digit;
    bit-identical to ntt_mxu3)."""
    w2f_refs = rest_refs[:r]
    out_ref = rest_refs[r]
    l = pl.program_id(0)
    q = scalars_ref[l, 0]
    r16 = scalars_ref[l, 1]
    r16s = scalars_ref[l, 2]
    r32 = scalars_ref[l, 3]
    r32s = scalars_ref[l, 4]
    w1 = [[w1_ref[0, d, f] for f in range(4)] for d in range(4)]
    w2f = [
        [[w2f_refs[k3][0, d, f] for f in range(4)] for d in range(4)]
        for k3 in range(r)
    ]
    for gi in range(g):
        x = x_ref[gi, 0]
        y = _mod_matmul(_planes(x), w1, q, r16, r16s, r32, r32s, left=True)
        yd = _shoup(y, t_ref[0], t_s_ref[0], q)
        if r == 2:
            lo, hi = yd[:, :B], yd[:, B:]
            blocks = [_addmod(lo, hi, q), _submod(lo, hi, q)]
        elif r == 4:
            blocks = _dft4(
                [yd[:, k * B:(k + 1) * B] for k in range(4)],
                scalars_ref[l, 5], scalars_ref[l, 6], q)
        else:
            blocks = [yd]
        for k3 in range(r):
            z = _mod_matmul(_planes(blocks[k3]), w2f[k3],
                            q, r16, r16s, r32, r32s, left=False)
            out_ref[gi, 0, :, k3 * B:(k3 + 1) * B] = z


@partial(jax.jit, static_argnums=(0, 1))
def ntt3_grid_pallas(n: int, qs: tuple[int, ...], x):
    """[G, T, A·Br] coefficient rows → NTT domain (3-factor slot order),
    bit-identical to backend/ntt_mxu3.ntt_mxu3 on the same rows."""
    t = _pallas3_tables(n, qs)
    A, B, r = t["A"], t["B"], t["r"]
    Br = B * r
    T = len(qs)
    G = x.shape[0]
    smem = pl.BlockSpec((T, 9), lambda l: (0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        partial(_ntt_grid_kernel, r=r, B=B, g=G),
        grid=(T,),
        in_specs=[
            smem,
            _batch_limb_spec(G, (A, Br)),
            _limb_spec((4, 4, A, A)),
            _limb_spec((A, Br)), _limb_spec((A, Br)),
            *[_limb_spec((4, 4, B, B)) for _ in range(r)],
        ],
        out_specs=_batch_limb_spec(G, (A, Br)),
        out_shape=jax.ShapeDtypeStruct((G, T, A, Br), jnp.uint32),
    )(t["scal"], x.reshape(G, T, A, Br), t["w1"], t["T"], t["T_s"],
      *t["w2f"])
    return out.reshape(G, T, n)


def _rescale_fwd_kernel(scalars_ref, rsc_ref, extw_ref, extws_ref, cj_ref,
                        xp_ref, isneg_ref, t_ref2, tneg_ref, w1_ref, t_ref,
                        t_s_ref, *rest_refs, K: int, r: int, B: int, g: int,
                        zp: int, use_bd: bool = False):
    """Per-keep-limb δ-correction + exact P-division + forward NTT.
    Stage-3 dots batch all g rows (and k3 blocks via the block-diagonal
    matrix at r ≤ 2) — the widening of _tensor_intt_kernel, mirrored."""
    nw2 = 1 if use_bd else r
    w2_refs = rest_refs[:nw2]
    out_ref = rest_refs[nw2]
    l = pl.program_id(0)
    q = scalars_ref[l, 0]
    r16 = scalars_ref[l, 1]
    r16s = scalars_ref[l, 2]
    r32 = scalars_ref[l, 3]
    r32s = scalars_ref[l, 4]
    p_mod = rsc_ref[l, 0]
    p_mod_s = rsc_ref[l, 1]
    inv_p = rsc_ref[l, 2]
    inv_p_s = rsc_ref[l, 3]
    w1 = [[w1_ref[0, d, f] for f in range(4)] for d in range(4)]
    w2 = [
        [[w2_refs[k][0, d, f] for f in range(4)] for d in range(4)]
        for k in range(nw2)
    ]
    Br = r * B
    zp32 = np.uint32(zp)
    blocks_all = []
    for gi in range(g):
        # base extension of V = Σ_k x_k·π_k to this limb (she/hybrid
        # extend_digits order: ascending k)
        acc = None
        for k in range(K):
            xk = xp_ref[gi, :, k * Br:(k + 1) * Br]
            term = _shoup(xk, extw_ref[l, k], extws_ref[l, k], q)
            acc = term if acc is None else _addmod(acc, term, q)
        isneg = isneg_ref[gi]
        vq = jnp.where(isneg != 0, _submod(acc, p_mod, q), acc)
        tval = t_ref2[gi]
        tc = jnp.where(tneg_ref[gi] != 0, q - (zp32 - tval), tval)
        delta = _addmod(vq, _shoup(tc, p_mod, p_mod_s, q), q)
        diff = _submod(cj_ref[gi, 0], delta, q)
        x0 = _shoup(diff, inv_p, inv_p_s, q)
        # forward 3-factor NTT stage 1 + twiddle + butterfly
        y = _mod_matmul(_planes(x0), w1, q, r16, r16s, r32, r32s, left=True)
        yd = _shoup(y, t_ref[0], t_s_ref[0], q)
        if r == 2:
            lo, hi = yd[:, :B], yd[:, B:]
            blocks = [_addmod(lo, hi, q), _submod(lo, hi, q)]
        elif r == 4:
            blocks = _dft4([yd[:, k * B:(k + 1) * B] for k in range(4)],
                           scalars_ref[l, 5], scalars_ref[l, 6], q)
        else:
            blocks = [yd]
        blocks_all.append(blocks)
    A = cj_ref.shape[-2]
    if use_bd:
        X = jnp.concatenate(
            [jnp.concatenate(bl, axis=1) for bl in blocks_all], axis=0) \
            if g > 1 else jnp.concatenate(blocks_all[0], axis=1)
        Z = _mod_matmul(_planes(X), w2[0], q, r16, r16s, r32, r32s,
                        left=False)
        for gi in range(g):
            out_ref[gi, 0] = Z[gi * A:(gi + 1) * A, :]
    else:
        for k3 in range(r):
            X = jnp.concatenate(
                [bl[k3] for bl in blocks_all], axis=0) \
                if g > 1 else blocks_all[0][k3]
            z = _mod_matmul(_planes(X), w2[k3], q, r16, r16s, r32, r32s,
                            left=False)
            for gi in range(g):
                out_ref[gi, 0, :, k3 * B:(k3 + 1) * B] = \
                    z[gi * A:(gi + 1) * A, :]


@lru_cache(maxsize=None)
def _rescale_consts(keep: tuple[int, ...], drop: tuple[int, ...]):
    """SMEM tables: per-keep-limb (P mod q, shoup, P⁻¹ mod q, shoup) and the
    Garner-π extension constants [L, K] (+ companions)."""
    P = 1
    for x in drop:
        P *= x
    rsc = np.zeros((len(keep), 4), dtype=np.uint32)
    for j, qj in enumerate(keep):
        pm = P % qj
        iv = pow(pm, -1, qj)
        rsc[j] = (pm, shoup_const(pm, qj), iv, shoup_const(iv, qj))
    pis = []
    pi = 1
    for x in drop:
        pis.append(pi)
        pi *= x
    w = np.array([[p % q for p in pis] for q in keep], dtype=np.uint32)
    ws = np.array([[shoup_const(p % q, q) for p in pis] for q in keep],
                  dtype=np.uint32)
    return rsc, w, ws


@partial(jax.jit, static_argnums=(0, 2))
def rescale_joint_pallas(p, ct, k_drop: int):
    """Fused she/hybrid.rescale_joint: ct [..., T, n] NTT domain (3-factor
    order) → [..., T-k_drop, n]. Bit-identical to the jnp formulation."""
    from alchemy_tpu.she.hybrid import _garner_tables, garner_digits

    qs = p.qs
    T = len(qs)
    keep, drop = qs[:-k_drop], qs[-k_drop:]
    L = len(keep)
    pz = p.zp
    if pz & (pz - 1) or pz > (1 << 16):
        raise ValueError("rescale_joint requires a power-of-two zp <= 2^16")
    P = 1
    for x in drop:
        P *= x
    lead = ct.shape[:-2]
    G = int(np.prod(lead)) if lead else 1
    n = p.n

    coeff = intt3_grid_pallas(n, qs, ct.reshape(G, T, n))     # kernel C
    # --- host-jnp flags: EXACTLY she/hybrid.rescale_joint lines ---
    r_rows = coeff[:, L:, :]                                  # [G, K, n]
    xs = garner_digits(r_rows, drop)
    pi, _ = _garner_tables(drop)
    hd = []
    h = P // 2
    for x in drop:
        hd.append(h % x)
        h //= x
    gt = jnp.zeros(xs[0].shape, dtype=bool)
    eq = jnp.ones(xs[0].shape, dtype=bool)
    for k in range(len(drop) - 1, -1, -1):
        gt = gt | (eq & (xs[k] > np.uint32(hd[k])))
        eq = eq & (xs[k] == np.uint32(hd[k]))
    is_neg = gt
    mask = np.uint32(pz - 1)
    vz = jnp.zeros_like(xs[0])
    for k, x in enumerate(xs):
        vz = (vz + (x & mask) * np.uint32(pi[k] % pz)) & mask
    vz = jnp.where(is_neg, (vz + np.uint32(pz) - np.uint32(P % pz)) & mask, vz)
    inv_P_zp = pow(P % pz, -1, pz) if pz > 1 else 0
    t = (((np.uint32(pz) - vz) & mask) * np.uint32(inv_P_zp)) & mask
    t_neg = t > pz // 2

    tabs = _pallas3_tables(n, keep)
    A, B, r = tabs["A"], tabs["B"], tabs["r"]
    Br = B * r
    K = k_drop
    rsc, w, ws = _rescale_consts(keep, drop)
    x_pack = jnp.concatenate(
        [xk.reshape(G, A, Br) for xk in xs], axis=-1)         # [G, A, K·Br]
    smem = pl.BlockSpec((L, 9), lambda l: (0, 0), memory_space=pltpu.SMEM)
    smem4 = pl.BlockSpec((L, 4), lambda l: (0, 0), memory_space=pltpu.SMEM)
    smemK = pl.BlockSpec((L, K), lambda l: (0, 0), memory_space=pltpu.SMEM)
    use_bd = tabs["w2f_bd"] is not None
    if use_bd:
        w2_tabs = (tabs["w2f_bd"],)
        w2_specs = [_limb_spec((4, 4, Br, Br))]
    else:
        w2_tabs = tuple(tabs["w2f"])
        w2_specs = [_limb_spec((4, 4, B, B)) for _ in range(r)]
    out = pl.pallas_call(
        partial(_rescale_fwd_kernel, K=K, r=r, B=B, g=G, zp=pz,
                use_bd=use_bd),
        grid=(L,),
        in_specs=[
            smem, smem4, smemK, smemK,
            _batch_limb_spec(G, (A, Br)),
            _full_spec((G, A, K * Br)),
            _full_spec((G, A, Br)), _full_spec((G, A, Br)),
            _full_spec((G, A, Br)),
            _limb_spec((4, 4, A, A)),
            _limb_spec((A, Br)), _limb_spec((A, Br)),
            *w2_specs,
        ],
        out_specs=_batch_limb_spec(G, (A, Br)),
        out_shape=jax.ShapeDtypeStruct((G, L, A, Br), jnp.uint32),
    )(tabs["scal"], rsc, w, ws,
      coeff[:, :L, :].reshape(G, L, A, Br),
      x_pack,
      is_neg.astype(U32).reshape(G, A, Br),
      t.reshape(G, A, Br),
      t_neg.astype(U32).reshape(G, A, Br),
      tabs["w1"], tabs["T"], tabs["T_s"], *w2_tabs)
    return out.reshape(*lead, L, n)
