"""Pallas TPU kernel: the fused 4-step negacyclic NTT.

One kernel invocation per RNS limb (grid = (L,)); the entire transform —
ψ pre-twist, digit-plane split, DFT-over-rows matmul (MXU), twiddle,
DFT-over-columns matmul (MXU), modular recombination — runs VMEM-resident,
so HBM sees only the input/output rows and the per-limb constant tables.
Same tables and slot order as backend/ntt_mxu.py (natural-order (k1, k2)
grid), so outputs are bit-identical to the jnp MXU path.

Matmuls avoid runtime transposes: the row DFT is W1 @ x ([n1,n1]×[n1,n2]),
the column DFT is y @ W2ᵀ ([n1,n2]×[n2,n2] with W2ᵀ precomputed).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alchemy_tpu.backend.ntt_mxu import mxu_tables

U32 = jnp.uint32
_M16 = np.uint32(0xFFFF)
_M8 = np.uint32(0xFF)


def _mulhi(a, b):
    a0, a1 = a & _M16, a >> np.uint32(16)
    b0, b1 = b & _M16, b >> np.uint32(16)
    p01 = a0 * b1
    mid = p01 + a1 * b0
    carry_mid = (mid < p01).astype(U32)
    lo = a0 * b0 + (mid << np.uint32(16))
    carry_lo = (lo < a0 * b0).astype(U32)
    return a1 * b1 + (mid >> np.uint32(16)) + (carry_mid << np.uint32(16)) + carry_lo


def _shoup(a, w, ws, q):
    hi = _mulhi(a, ws)
    r = a * w - hi * q
    return jnp.where(r >= q, r - q, r)


def _shoup_raw(a, w, ws, q):
    """Shoup multiply WITHOUT the conditional subtract: result in [0, 2q),
    ≡ a·w (mod q), valid for any u32 a. Lazy-reduction building block for
    q < 2^30 chains (two raw results add without overflow)."""
    return a * w - _mulhi(a, ws) * q


def _reduce_u32(v, q, r16, r16s):
    ll, lh = v & _M16, v >> np.uint32(16)
    t = _shoup(lh, r16, r16s, q) + ll
    return jnp.where(t >= q, t - q, t)


def _planes(x):
    # Mosaic has no u32→float cast; digits are < 256 so bitcast to i32 first
    out = []
    for d in range(4):
        v = (x >> np.uint32(8 * d)) & _M8
        vi = jax.lax.bitcast_convert_type(v, jnp.int32)
        out.append(vi.astype(jnp.float32).astype(jnp.bfloat16))
    return out


def _matmul_sums(planes_x, W_planes, left: bool):
    """The pure-MXU phase of _mod_matmul: the digit-plane bf16 dots,
    accumulated into the 4 scale-f plane sums (u32, exact). Split out so a
    caller can queue several matmuls' dots before any VPU recombination
    (MXU/VPU overlap in kernel B).

    When the contraction K ≤ 128, adjacent input planes are PAIRED along
    the contraction axis: 8 dots of 2K replace 16 dots of K — still exact
    (each paired dot ≤ 255·255·2K < 2^24 in f32) and bit-identical (the
    paired dot equals the u32 sum of the two separate dots), with half the
    MXU issues at double the pipeline depth."""
    K = planes_x[0].shape[0] if left else planes_x[0].shape[-1]
    if K <= 128:
        ax = 0 if left else 1
        xp = [jnp.concatenate([planes_x[0], planes_x[1]], axis=ax),
              jnp.concatenate([planes_x[2], planes_x[3]], axis=ax)]
        sums = [None] * 4
        for pi, (d0, d1) in enumerate(((0, 1), (2, 3))):
            for f in range(4):
                if left:
                    We = jnp.concatenate(
                        [W_planes[d0][f], W_planes[d1][f]], axis=1)
                    prod = jnp.dot(We, xp[pi],
                                   preferred_element_type=jnp.float32)
                else:
                    We = jnp.concatenate(
                        [W_planes[d0][f], W_planes[d1][f]], axis=0)
                    prod = jnp.dot(xp[pi], We,
                                   preferred_element_type=jnp.float32)
                prod = jax.lax.bitcast_convert_type(
                    prod.astype(jnp.int32), U32)
                sums[f] = prod if sums[f] is None else sums[f] + prod
        return sums
    sums = [None] * 4
    for d in range(4):
        xd = planes_x[d]
        for f in range(4):
            We = W_planes[d][f]
            if left:
                prod = jnp.dot(We, xd, preferred_element_type=jnp.float32)
            else:
                prod = jnp.dot(xd, We, preferred_element_type=jnp.float32)
            # f32 → i32 (exact, < 2^24) → bitcast u32
            prod = jax.lax.bitcast_convert_type(prod.astype(jnp.int32), U32)
            sums[f] = prod if sums[f] is None else sums[f] + prod
    return sums


def _assemble_lo_hi(sums):
    """Assemble the 4 scale-f plane sums into the exact (lo, hi) pair with
    value = lo + 2^32·hi (hi < 2^19). Split from _recombine_sums so callers
    can consume the UNREDUCED pair — e.g. kernel B's twiddle multiplies
    (lo, hi) directly via two Shoup mults against (T, 2^32·T mod q) tables,
    skipping the mod-q canonicalization between stage 1 and the twiddle."""
    lo = sums[0]
    hi = jnp.zeros_like(lo)
    for f in (1, 2, 3):
        add_lo = sums[f] << np.uint32(8 * f)
        lo = lo + add_lo
        carry = (lo < add_lo).astype(U32)
        hi = hi + (sums[f] >> np.uint32(32 - 8 * f)) + carry
    return lo, hi


def _recombine_sums(sums, q, r16, r16s, r32, r32s):
    """The VPU phase of _mod_matmul: assemble the plane sums into an exact
    (lo, hi) pair and reduce mod q once (see backend/ntt_mxu.py)."""
    lo, hi = _assemble_lo_hi(sums)
    lored = _reduce_u32(lo, q, r16, r16s)
    hired = _shoup(hi, r32, r32s, q)  # hi < 2^19
    out = hired + lored
    return jnp.where(out >= q, out - q, out)


def _assemble_w0_m(sums):
    """Byte-serial exact assembly of 4 scale-f plane sums into
    value = w0 + 2^16·m with w0 < 2^16 and m < 2^32 — no compare-carries
    (each step propagates the previous sum's high bits into the next byte
    lane; all intermediates fit u32 for contraction K ≤ 256 with q < 2^30,
    see _recombine_sums_fast for the bound)."""
    s0, s1, s2, s3 = sums
    b0 = s0 & np.uint32(0xFF)
    u = (s0 >> np.uint32(8)) + s1
    b1 = u & np.uint32(0xFF)
    v = (u >> np.uint32(8)) + s2
    b2 = v & np.uint32(0xFF)
    w = (v >> np.uint32(8)) + s3          # < 2^24
    return b0 + (b1 << np.uint32(8)), b2 + (w << np.uint32(8))


def _recombine_sums_fast(sums, q, r16, r16s, canonical: bool = False):
    """Fast exact recombination for q < 2^30 and contraction K ≤ 256
    (the measured 73.5 µs/ct cost center of kernel B — VERDICT r5 #1).

    Bound: the scaled weight matrices 2^(8d)·W mod q are < 2^30, so their
    top byte planes are < 64; with 8-bit input planes and K ≤ 256,
      s_f ≤ 4·K·255·255 < 2^27   (f ≤ 2),   s_3 ≤ 4·K·255·63
    and the assembled hi = Σ_f (s_f >> (32−8f)) + carries ≤ 65,281 < 2^16.
    Then value = lo + 2^32·hi = w0 + 2^16·m exactly, with
      w0 = lo & 0xffff,  m = (lo >> 16) + (hi << 16)  (both < 2^32),
    so ONE raw Shoup multiply m·2^16 mod q replaces the
    reduce_u32 + Shoup + addmod chain:
      r = shoup_raw(m, r16, r16s) + w0  ∈  [0, 2q + 2^16)  ≡  value (mod q).

    canonical=False returns that congruent-unreduced value — correct
    wherever the consumer is another Shoup multiply (hint products, the
    big twiddle), which accepts any u32. canonical=True canonicalizes with
    two conditional subtractions (2^16 < q). Callers must check the
    q < 2^30 / K ≤ 256 precondition (static at trace time).

    The (w0, m) pair is assembled BYTE-SERIALLY — propagate each sum's
    high bits into the next byte lane (u = (s0>>8)+s1 < 2^26 etc., no u32
    overflow anywhere, no compare-carries):
      value = b0 + 2^8·b1 + 2^16·b2 + 2^24·w,  w < 2^24  (K ≤ 256 bound)
    which is exact and ~8 ops cheaper per element than the generic
    carry-chain assembly."""
    w0, m = _assemble_w0_m(sums)          # value = w0 + 2^16·m, w0 < 2^16
    r = m * r16 - _mulhi(m, r16s) * q + w0
    if canonical:
        r = jnp.where(r >= q, r - q, r)
        r = jnp.where(r >= q, r - q, r)
    return r


def recombine_fast_ok(qs) -> bool:
    """Static precondition for _recombine_sums_fast (K ≤ 256 is checked by
    the call sites; every kernel contraction here is ≤ 256)."""
    return max(int(q) for q in qs) < (1 << 30)


def _mod_matmul(planes_x, W_planes, q, r16, r16s, r32, r32s, left: bool):
    """Σ_b W[a,b]·x[b,·] (left=True: W @ x) or Σ_b x[·,b]·Wt[b,a]
    (left=False: x @ Wt), with digit-plane exact bf16 matmuls over the
    scaled planes V_{d,f} of 2^(8d)·W mod q (W_planes[d][f]); the four
    plane sums assemble into an exact (lo, hi) pair reduced mod q once
    (see backend/ntt_mxu.py)."""
    return _recombine_sums(_matmul_sums(planes_x, W_planes, left),
                           q, r16, r16s, r32, r32s)


def _fwd_kernel(scalars_ref, x_ref, w1_ref, tw_ref, tw_s_ref,
                w2t_ref, out_ref):
    # scalars: [L, 5] in SMEM: q, r16, r16s, r32, r32s
    # (psi twists are folded into W1/tw — see backend/ntt_mxu.py tables)
    l = pl.program_id(0)
    q = scalars_ref[l, 0]
    r16 = scalars_ref[l, 1]
    r16s = scalars_ref[l, 2]
    r32 = scalars_ref[l, 3]
    r32s = scalars_ref[l, 4]
    x = x_ref[0]                       # [n1, n2] u32
    y = _mod_matmul(_planes(x),
                    [[w1_ref[0, d, f] for f in range(4)] for d in range(4)],
                    q, r16, r16s, r32, r32s, left=True)
    y = _shoup(y, tw_ref[0], tw_s_ref[0], q)
    z = _mod_matmul(_planes(y),
                    [[w2t_ref[0, d, f] for f in range(4)] for d in range(4)],
                    q, r16, r16s, r32, r32s, left=False)
    out_ref[0] = z


def _inv_kernel(scalars_ref, x_ref, w2it_ref, itw_ref, itw_s_ref, w1i_ref,
                out_ref):
    l = pl.program_id(0)
    q = scalars_ref[l, 0]
    r16 = scalars_ref[l, 1]
    r16s = scalars_ref[l, 2]
    r32 = scalars_ref[l, 3]
    r32s = scalars_ref[l, 4]
    x = x_ref[0]                       # [n1, n2] in (k1, k2) grid order
    z = _mod_matmul(_planes(x),
                    [[w2it_ref[0, d, f] for f in range(4)] for d in range(4)],
                    q, r16, r16s, r32, r32s, left=False)
    z = _shoup(z, itw_ref[0], itw_s_ref[0], q)
    y = _mod_matmul(_planes(z),
                    [[w1i_ref[0, d, f] for f in range(4)] for d in range(4)],
                    q, r16, r16s, r32, r32s, left=True)
    out_ref[0] = y


@lru_cache(maxsize=None)
def _pallas_tables(n: int, qs: tuple[int, ...]):
    t = mxu_tables(n, qs)
    n1, n2 = t["n1"], t["n2"]
    L = len(qs)
    scal = np.zeros((L, 5), dtype=np.uint32)
    scal[:, 0] = t["q"][:, 0, 0]
    scal[:, 1] = t["r16"][:, 0, 0]
    scal[:, 2] = t["r16s"][:, 0, 0]
    scal[:, 3] = t["r32"][:, 0, 0]
    scal[:, 4] = t["r32s"][:, 0, 0]

    import ml_dtypes

    def bf16(planes):  # [L, 4, 4, a, b] f32 host → host bf16 numpy
        return np.ascontiguousarray(planes.astype(ml_dtypes.bfloat16))

    # host numpy only: cached tables must not capture jit-trace constants
    return {
        "n1": n1, "n2": n2,
        "scal": scal,
        "tw": t["tw"][0],
        "tw_s": t["tw"][1],
        "itw": t["itw"][0],
        "itw_s": t["itw"][1],
        "w1": bf16(t["W1"]),
        "w1i": bf16(t["W1i"]),
        "w2t": bf16(np.swapaxes(t["W2"], -1, -2).copy()),
        "w2it": bf16(np.swapaxes(t["W2i"], -1, -2).copy()),
    }


def _limb_spec(shape):
    return pl.BlockSpec((1, *shape), lambda l: (l, *([0] * len(shape))),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnums=(1, 2))
def ntt_pallas(x, n: int, qs: tuple[int, ...]):
    """Forward negacyclic NTT, [L, n] u32 → [L, n]; bit-identical to
    backend/ntt_mxu.ntt_mxu."""
    t = _pallas_tables(n, qs)
    n1, n2 = t["n1"], t["n2"]
    L = len(qs)
    xg = x.reshape(L, n1, n2)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((L, 5), lambda l: (0, 0), memory_space=pltpu.SMEM),
            _limb_spec((n1, n2)),
            _limb_spec((4, 4, n1, n1)),
            _limb_spec((n1, n2)),
            _limb_spec((n1, n2)),
            _limb_spec((4, 4, n2, n2)),
        ],
        out_specs=_limb_spec((n1, n2)),
        out_shape=jax.ShapeDtypeStruct((L, n1, n2), jnp.uint32),
    )(t["scal"], xg, t["w1"], t["tw"], t["tw_s"], t["w2t"])
    return out.reshape(L, n)


@partial(jax.jit, static_argnums=(1, 2))
def intt_pallas(x, n: int, qs: tuple[int, ...]):
    t = _pallas_tables(n, qs)
    n1, n2 = t["n1"], t["n2"]
    L = len(qs)
    xg = x.reshape(L, n1, n2)
    out = pl.pallas_call(
        _inv_kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((L, 5), lambda l: (0, 0), memory_space=pltpu.SMEM),
            _limb_spec((n1, n2)),
            _limb_spec((4, 4, n2, n2)),
            _limb_spec((n1, n2)),
            _limb_spec((n1, n2)),
            _limb_spec((4, 4, n1, n1)),
        ],
        out_specs=_limb_spec((n1, n2)),
        out_shape=jax.ShapeDtypeStruct((L, n1, n2), jnp.uint32),
    )(t["scal"], xg, t["w2it"], t["itw"], t["itw_s"], t["w1i"])
    return out.reshape(L, n)
