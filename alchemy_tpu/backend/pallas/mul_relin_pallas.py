"""Pallas TPU kernel: fused BGV ciphertext multiply + relinearization.

The jnp/XLA formulation of the hot op (she/fast.py mul_relin) is HBM-bound:
of ~430 us device time at the north-star config (n=2^15, L=8) only a small
fraction is MXU matmuls — the rest is elementwise fusions shuttling the
[D, L, n] digit tensor, its bf16 digit planes, and the plane sums through
HBM between XLA fusions. These kernels keep the whole relinearization
dataflow VMEM-resident AND use the 3-factor NTT (backend/ntt_mxu3.py:
n = 128·128·r, r ∈ {1, 2, 4} — i.e. rings 2^14, 2^15, 2^16) whose MXU cost
is n·256 base MACs per limb transform vs n·384 for the 2-factor split:

  kernel A (grid over limbs d):  c0/c1/c2 tensor product (general modmuls —
      exact canonical residues, so bit-identical to the jnp path regardless
      of association) and the inverse NTT of c2 to coefficients, one limb
      per program.
  kernel B (grid over output limbs l): stage 1 of the forward NTT runs for
      ALL gadget digits as ONE wide dot ([128,128] @ [128, D·B·r] — digits
      enter UNREDUCED mod q_l; the digit-plane matmul reduces any uint32
      exactly at recombination, DESIGN.md); the twiddle, radix-r butterfly,
      per-k3 stage-3 dots, hint products, and accumulation into (out0,
      out1) never leave VMEM. Hints stream either as raw u32 (each slice
      read once, general modmul products) or as (values, companions) Shoup
      pairs — 2× hint HBM for ~3× cheaper products, the measured win for
      the TrivGad L² product count and the default via
      fast.relin_hint(shoup=True).

Semantics identical to she/fast.py mul_relin (reference: the key-switch /
relinearization dataflow of SymmSHE `keySwitchQuadCirc`, consumed at
/root/reference Crypto/Alchemy/Interpreter/Eval.hs:126,133); outputs are
bit-identical to the jnp 3-factor path (impl="pallas"; tests/test_pallas.py).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alchemy_tpu.backend.ntt_mxu3 import mxu3_tables
from alchemy_tpu.backend.xla import shoup_const
from alchemy_tpu.backend.pallas.ntt_pallas import (
    _M16,
    _assemble_w0_m,
    _matmul_sums,
    _planes,
    _recombine_sums,
    _recombine_sums_fast,
    _reduce_u32,
    _shoup,
    _shoup_raw,
    recombine_fast_ok,
)

U32 = jnp.uint32

#: kernel B issues all stage-3 MXU dot groups before the VPU
#: recombination/hint phase (measured ≥ the alternating order on device,
#: bit-identical); ALCHEMY_KB_OVERLAP=0 restores the alternating order
_KB_OVERLAP = os.environ.get("ALCHEMY_KB_OVERLAP", "1") == "1"

#: ct-major kernel B at the headline configs (see
#: _digit_relin_ctmajor_kernel); ALCHEMY_KB_CTMAJOR=0 restores the
#: limb-major digit-chunked kernel everywhere
_KB_CTMAJOR = os.environ.get("ALCHEMY_KB_CTMAJOR", "1") == "1"

#: limb-group size for the ct-major stacked stage-1 dot (VMEM/width
#: trade; measured on device)
_KB_LG = int(os.environ.get("ALCHEMY_KB_LG", "2"))

#: TIMING-ONLY ablations for the ct-major kernel's phase ledger
#: (BASELINE.md floor accounting): "none" (default, bit-exact), "nohint"
#: (skip the hint Shoup products), "notw" (skip the twiddle multiplies),
#: "norecomb3" (skip the stage-3 plane recombination). Non-"none" values
#: produce WRONG results — timing probes only, never correctness runs.
_KB_ABLATE = os.environ.get("ALCHEMY_KB_ABLATE", "none")

#: software-pipeline the ct-major limb groups: issue group g+1's stacked
#: stage-1 MXU dots before group g's VPU phase (measured experiment)
_KB_PIPE = os.environ.get("ALCHEMY_KB_PIPE", "0") == "1"

#: ct-major applicability bounds. Experiment knobs: 2^16/r=4 needs
#: LANES=4096, HINT_MB=70 and VMEM_MB=120 — it compiles and is
#: bit-identical but measured a WASH vs the limb-major kernel (2018 vs
#: 2035 ops/s at L=8/Bt=8), so the defaults keep 2^16 limb-major
_KB_CTMAJOR_LANES = int(os.environ.get("ALCHEMY_KB_CTMAJOR_LANES", "2048"))
_KB_CTMAJOR_HINT_MB = float(os.environ.get("ALCHEMY_KB_CTMAJOR_HINT_MB", "40"))
_KB_VMEM_MB = int(os.environ.get("ALCHEMY_KB_VMEM_MB", "100"))


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


def _dft4(blocks, i_v, i_s, q):
    """Radix-4 DFT over 4 [..., B] blocks with the order-4 root i (i² = −1
    mod q, so only the odd-difference arm needs a real mulmod: 1 Shoup mult
    + 8 add/sub per butterfly). For the inverse pass i_v is i⁻¹ = −i."""
    b0, b1, b2, b3 = blocks
    e0 = _addmod(b0, b2, q)
    e1 = _submod(b0, b2, q)
    o0 = _addmod(b1, b3, q)
    o1 = _submod(b1, b3, q)
    io1 = _shoup(o1, i_v, i_s, q)
    return [_addmod(e0, o0, q), _addmod(e1, io1, q),
            _submod(e0, o0, q), _submod(e1, io1, q)]


@lru_cache(maxsize=None)
def _pallas3_tables(n: int, qs: tuple[int, ...]):
    """Host bf16/u32 tables for the 3-factor kernels (cached numpy)."""
    t = mxu3_tables(n, qs)
    if t["r"] not in (1, 2, 4):
        raise ValueError(f"pallas mul_relin supports r in (1, 2, 4); n={n}")
    L = len(qs)
    # columns 0-4: q, r16, r16s, r32, r32s; columns 5-8 (r=4 only): the
    # order-4 root i = u^B and i⁻¹ = −i with their Shoup companions
    scal = np.zeros((L, 9), dtype=np.uint32)
    scal[:, 0] = t["q"][:, 0, 0]
    scal[:, 1] = t["r16"][:, 0, 0]
    scal[:, 2] = t["r16s"][:, 0, 0]
    scal[:, 3] = t["r32"][:, 0, 0]
    scal[:, 4] = t["r32s"][:, 0, 0]
    if t["r"] == 4:
        urth, urth_s = t["urth"]
        urth_i, urth_is = t["urth_i"]
        scal[:, 5] = urth[:, 1, 1]
        scal[:, 6] = urth_s[:, 1, 1]
        scal[:, 7] = urth_i[:, 1, 1]
        scal[:, 8] = urth_is[:, 1, 1]

    import ml_dtypes

    def bf16(planes):
        return np.ascontiguousarray(planes.astype(ml_dtypes.bfloat16))

    # fold the small k3-twiddles into the stage-3 matrices: forward
    # M_k3[j2, k2] = tb[k3, j2]·W2[j2, k2] (diagonal on the contraction
    # index), inverse Mi_k3[k2, j2] = W2i[k2, j2]·tbi[k3, j2] (diagonal on
    # the output index) — one fewer sequential VPU step per block
    from alchemy_tpu.backend.ntt_mxu import scaled_planes as _sp
    L = len(qs)
    r = t["r"]
    B = t["B"]
    w2f, w2if = [], []
    for k3 in range(r):
        fwd, inv = [], []
        for li, q in enumerate(qs):
            tb = t["tb_raw"][li, k3].astype(np.int64)
            tbi = t["tbi_raw"][li, k3].astype(np.int64)
            fwd.append(_sp((tb[:, None] * t["W2_raw"][li]) % q, q))
            inv.append(_sp((t["W2i_raw"][li] * tbi[None, :]) % q, q))
        w2f.append(bf16(np.stack(fwd)))
        w2if.append(bf16(np.stack(inv)))
    # block-diagonal inverse stage-3 matrix (r ≤ 2 only: at r=4 the [Br,Br]
    # bf16 planes would blow kernel A's VMEM): merges the per-k3 dots into
    # ONE [·, Br] @ [Br, Br] dot — the kernel is MXU-issue-bound, so fewer,
    # wider dots win even with the 2× zero-block MACs
    w2if_bd = w2f_bd = None
    if r <= 2:
        bd_i, bd_f = [], []
        for li, q in enumerate(qs):
            bdi = np.zeros((r * B, r * B), dtype=np.int64)
            bdf = np.zeros((r * B, r * B), dtype=np.int64)
            for k3 in range(r):
                tbi = t["tbi_raw"][li, k3].astype(np.int64)
                tb = t["tb_raw"][li, k3].astype(np.int64)
                sl = slice(k3 * B, (k3 + 1) * B)
                bdi[sl, sl] = (t["W2i_raw"][li] * tbi[None, :]) % q
                bdf[sl, sl] = (tb[:, None] * t["W2_raw"][li]) % q
            bd_i.append(_sp(bdi, q))
            bd_f.append(_sp(bdf, q))
        w2if_bd = bf16(np.stack(bd_i))
        w2f_bd = bf16(np.stack(bd_f))
    # T16 = (2^16·T) mod q with companions: the ct-major kernel twiddles
    # the UNREDUCED byte-serial stage-1 pair (value = w0 + 2^16·m) directly
    # — tw = shoup(w0, T) ⊕ shoup(m, T16) — skipping the mod-q
    # canonicalization between stage 1 and the twiddle (Shoup is exact for
    # any u32 input when the multiplier is the precomputed constant)
    Tv = t["T"][0].astype(np.int64)                      # [L, A, Br]
    qs_col = np.array(qs, dtype=np.int64)[:, None, None]
    t16v = (Tv << 16) % qs_col
    t16s = np.empty_like(t16v)
    for li, q in enumerate(qs):
        t16s[li] = (t16v[li].astype(object) << 32) // q
    # stacked stage-1 forward planes [4, 4, L·A, A]: ONE left dot covers a
    # whole limb group (the ct-major kernel slices row blocks) — fewer,
    # wider MXU issues than per-limb [A, A] dots
    w1s = np.ascontiguousarray(
        np.asarray(t["W1"]).transpose(1, 2, 0, 3, 4).reshape(
            4, 4, L * t["A"], t["A"]))
    return {
        "A": t["A"], "B": t["B"], "r": r,
        "scal": scal,
        "w1": bf16(t["W1"]), "w1i": bf16(t["W1i"]),
        "w1s": bf16(w1s),
        "w2f": w2f, "w2if": w2if,    # lists over k3: [L, 4, 4, B, B]
        "w2if_bd": w2if_bd,          # [L, 4, 4, Br, Br] or None (r = 4)
        "w2f_bd": w2f_bd,
        "T": t["T"][0], "T_s": t["T"][1],
        "T16": t16v.astype(np.uint32), "T16_s": t16s.astype(np.uint32),
        "Ti": t["Ti"][0], "Ti_s": t["Ti"][1],
    }


def _tensor_intt_kernel(scalars_ref, ca_ref, cb_ref,
                        *rest_refs, r: int, B: int, bt: int, nlimb: int,
                        use_bd: bool = False, fast_rec: bool = False):
    """Per-limb tensor product (c0, c1) and 3-factor iNTT(c2).

    The kernel is MXU-ISSUE-bound, not MAC-bound (measured: it dominated
    the fused op at 2^15 before this restructure), so the small dots are
    widened: the stage-3 inverse dots run ONCE per k3 with the whole
    ciphertext batch concatenated along rows ([Bt·A, B] @ [B, B] — same
    right matrix for every ct), and the inverse stage-1 left dot runs once
    per ct over ALL j3 column blocks ([A, A] @ [A, r·B] — same left
    matrix). Bit-identical: every element sees the same exact arithmetic,
    batching only widens the dots."""
    nw2 = 1 if use_bd else r
    w2_refs = rest_refs[:nw2]
    ti_ref, ti_s_ref, w1i_ref = (rest_refs[nw2], rest_refs[nw2 + 1],
                                 rest_refs[nw2 + 2])
    c0_ref, c1_ref, c2c_ref = (rest_refs[nw2 + 3], rest_refs[nw2 + 4],
                               rest_refs[nw2 + 5])
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
    mm = lambda x, y: _mulmod_gen(x, y, q, r16, r16s, r32, r32s)
    c2_all = []
    for b_i in range(bt):
        # cts enter in the caller's [Bt, 2, L, A, Br] layout directly (no
        # XLA slice/reshape copies between the jit boundary and the kernel)
        a0, a1 = ca_ref[b_i, 0, 0], ca_ref[b_i, 1, 0]
        b0, b1 = cb_ref[b_i, 0, 0], cb_ref[b_i, 1, 0]
        c0 = mm(a0, b0)
        c2 = mm(a1, b1)
        cross = mm(_addmod(a0, a1, q), _addmod(b0, b1, q))
        c1 = _submod(cross, _addmod(c0, c2, q), q)
        c0_ref[b_i, 0] = c0
        c1_ref[b_i, 0] = c1
        c2_all.append(c2)
    def _rec(sums, canonical):
        if fast_rec:
            return _recombine_sums_fast(sums, q, r16, r16s,
                                        canonical=canonical)
        return _recombine_sums(sums, q, r16, r16s, r32, r32s)

    if use_bd:
        # undo stage 3: ONE [Bt·A, Br] @ [Br, Br] block-diagonal dot
        X = jnp.concatenate(c2_all, axis=0) if bt > 1 else c2_all[0]
        # canonical: the radix-r butterfly's add/sub arithmetic needs
        # bounded operands
        Z = _rec(_matmul_sums(_planes(X), w2[0], left=False), True)
        blocks = [Z[:, k3 * B:(k3 + 1) * B] for k3 in range(r)]
    else:
        # one [Bt·A, B] @ [B, B] dot per k3 (batch along rows)
        blocks = []
        for k3 in range(r):
            X = jnp.concatenate(
                [c2_all[b][:, k3 * B:(k3 + 1) * B] for b in range(bt)],
                axis=0) if bt > 1 else c2_all[0][:, k3 * B:(k3 + 1) * B]
            blocks.append(
                _rec(_matmul_sums(_planes(X), w2[k3], left=False), True))
    # undo DFT_r (r = 2: plain sum/difference; r = 4: i⁻¹ butterfly)
    if r == 2:
        blocks = [_addmod(blocks[0], blocks[1], q),
                  _submod(blocks[0], blocks[1], q)]
    elif r == 4:
        blocks = _dft4(blocks, scalars_ref[l, 7], scalars_ref[l, 8], q)
    A = c2_all[0].shape[0]
    for b_i in range(bt):
        # inverse big twiddle, then stage 1 over ALL j3 blocks in one dot
        y_cat = jnp.concatenate([
            _shoup(blocks[j3][b_i * A:(b_i + 1) * A, :],
                   ti_ref[0][:, j3 * B:(j3 + 1) * B],
                   ti_s_ref[0][:, j3 * B:(j3 + 1) * B], q)
            for j3 in range(r)
        ], axis=1) if r > 1 else _shoup(
            blocks[0][b_i * A:(b_i + 1) * A, :], ti_ref[0], ti_s_ref[0], q)
        # canonical: c2c IS the gadget digit value (integer semantics)
        z = _rec(_matmul_sums(_planes(y_cat), w1i, left=True), True)
        c2c_ref[b_i, :, pl.ds(l * (r * B), r * B)] = z


def _digit_relin_kernel(scalars_ref, c2c_ref, c0_ref, c1_ref, w1_ref,
                        t_ref, t_s_ref, *rest_refs, dc: int, r: int, B: int,
                        bt: int, shoup: bool = False,
                        fast_rec: bool = False):
    """Forward digit NTTs + hint inner product, grid (output limb l, digit
    chunk c): VMEM per step holds only dc digit columns and dc hint rows —
    independent of the chain length L, so deep chains (L=16) fit the 16 MB
    scoped budget. The out block is revisited across c (same index_map):
    initialized from (c0, c1) at c == 0, accumulated after, in ascending
    digit order — the same association as the unchunked kernel, so results
    stay bit-identical.

    Both MXU stages run as wide dots over the chunk's digits: stage 1
    directly on the chunk's packed coefficient columns; stage 3 on VMEM
    scratch (one per k3) with the k3 twiddles folded into the matrices.

    shoup=True streams precomputed Shoup companions next to the hint values
    (hints are long-lived constants — she/fast.shoup_precompute): the hint
    inner product drops from the ~55-VPU-op general modmul to the
    ~18-op Shoup multiply. The products dominate the kernel's VPU time
    (2·D·L·n ≈ 4.2M modmuls per op at 2^15/L=8), so trading 2× hint HBM
    (~17 MB → ~34 MB, ≈ +20 us at ~0.8 TB/s) for the VPU savings wins.
    Results stay bit-identical (both compute the exact product mod q)."""
    w2f_refs = rest_refs[:r]
    if shoup:
        hb_ref, hbs_ref, ha_ref, has_ref = rest_refs[r:r + 4]
        out_ref = rest_refs[r + 4]
        scr_refs = rest_refs[r + 5:r + 5 + r]
    else:
        hb_ref, ha_ref, out_ref = rest_refs[r], rest_refs[r + 1], rest_refs[r + 2]
        scr_refs = rest_refs[r + 3:r + 3 + r]
    l = pl.program_id(0)
    c = pl.program_id(1)
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
    Br = r * B
    A = scr_refs[0].shape[0] // dc

    @pl.when(c == 0)
    def _init():
        for b_i in range(bt):
            for k3 in range(r):
                out_ref[0, b_i, 0, :, k3 * B:(k3 + 1) * B] = \
                    c0_ref[b_i, 0][:, k3 * B:(k3 + 1) * B]
                out_ref[1, b_i, 0, :, k3 * B:(k3 + 1) * B] = \
                    c1_ref[b_i, 0][:, k3 * B:(k3 + 1) * B]

    # (A cross-ciphertext software pipeline — issuing the next ct's stage-1
    # sums before this ct's VPU phase — measured 289 vs 284 us/ct at Bt=16:
    # Mosaic already overlaps from dependencies, and the extra live f32
    # sums cost VMEM. Kept simple.)
    for b_i in range(bt):
        s1 = _matmul_sums(_planes(c2c_ref[b_i]), w1, left=True)
        if fast_rec:
            # unreduced is fine: the consumer is the big-twiddle Shoup
            y = _recombine_sums_fast(s1, q, r16, r16s)        # [A, dc·Br]
        else:
            y = _recombine_sums(s1, q, r16, r16s, r32, r32s)
        for di in range(dc):
            yd = _shoup(y[:, di * Br:(di + 1) * Br], t_ref[0], t_s_ref[0], q)
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
                scr_refs[k3][di * A:(di + 1) * A, :] = blocks[k3]
        if _KB_OVERLAP:
            # experiment (ALCHEMY_KB_OVERLAP=1): queue ALL r stage-3 dot
            # groups on the MXU before any VPU recombination/hint work, so
            # the vector units overlap the systolic array instead of
            # alternating with it
            all_sums = [
                _matmul_sums(_planes(scr_refs[k3][...]), w2f[k3], left=False)
                for k3 in range(r)
            ]
        for k3 in range(r):
            # stage 3 for the chunk's digits at once: one [dc·A, B] @ [B, B]
            s3 = (all_sums[k3] if _KB_OVERLAP else
                  _matmul_sums(_planes(scr_refs[k3][...]), w2f[k3],
                               left=False))
            if fast_rec:
                # shoup hint products take any u32; the raw-hint general
                # modmul needs canonical operands
                z = _recombine_sums_fast(s3, q, r16, r16s,
                                         canonical=not shoup)
            else:
                z = _recombine_sums(s3, q, r16, r16s, r32, r32s)
            o0 = out_ref[0, b_i, 0, :, k3 * B:(k3 + 1) * B]
            o1 = out_ref[1, b_i, 0, :, k3 * B:(k3 + 1) * B]
            for di in range(dc):
                zd = z[di * A:(di + 1) * A, :]
                hb = hb_ref[di, 0][:, k3 * B:(k3 + 1) * B]
                ha = ha_ref[di, 0][:, k3 * B:(k3 + 1) * B]
                if shoup:
                    hbs = hbs_ref[di, 0][:, k3 * B:(k3 + 1) * B]
                    has = has_ref[di, 0][:, k3 * B:(k3 + 1) * B]
                    o0 = _addmod(o0, _shoup(zd, hb, hbs, q), q)
                    o1 = _addmod(o1, _shoup(zd, ha, has, q), q)
                else:
                    o0 = _addmod(
                        o0, _mulmod_gen(zd, hb, q, r16, r16s, r32, r32s), q)
                    o1 = _addmod(
                        o1, _mulmod_gen(zd, ha, q, r16, r16s, r32, r32s), q)
            out_ref[0, b_i, 0, :, k3 * B:(k3 + 1) * B] = o0
            out_ref[1, b_i, 0, :, k3 * B:(k3 + 1) * B] = o1


def _digit_relin_ctmajor_kernel(scalars_ref, c2c_ref, c0_ref, c1_ref,
                                w1s_ref, t_ref, t_s_ref, t16_ref, t16s_ref,
                                *rest_refs, r: int, B: int, L: int, lg: int):
    """Ct-major variant of kernel B: grid over ciphertexts, limbs unrolled
    inside — the VPU-cutting restructure (VERDICT r4 #1). Three levers vs
    the limb-major kernel, all bit-identical (exact mod-q arithmetic):

    1. The bf16 planes of the c2c digit block are LIMB-INDEPENDENT (the
       unreduced-digit trick makes the modulus enter only via the scaled
       weight planes), so they are extracted ONCE per ct instead of once
       per output limb (8× at L=8).
    2. Stage 1 runs as ONE stacked dot per limb group ([lg·A, A] @
       [A, L·Br]) and its output skips canonicalization: the twiddle
       multiplies the raw (lo, hi) plane-sum pair via two Shoup mults
       against (T, 2^32·T mod q) — ~25 fewer VPU ops per element than
       recombine-then-twiddle.
    3. Hints live VMEM-RESIDENT across the whole grid (constant index
       maps) and every limb's dataflow is independent SSA — no scratch
       write-after-read hazards — so Mosaic can overlap limb g+1's MXU
       dots with limb g's VPU recombination/hint products.

    Applies when the digit grid is single-chunk (L·Br ≤ 2048) and the four
    Shoup hint streams fit VMEM (~L²·n·16 B ≤ 40 MB): the n=2^14/2^15
    headline configs. Deep chains and 2^16 stay on the digit-chunked
    limb-major kernel."""
    w2f_refs = rest_refs[:r]
    hb_ref, hbs_ref, ha_ref, has_ref = rest_refs[r:r + 4]
    out_ref = rest_refs[r + 4]
    Br = r * B
    x = c2c_ref[0]                       # [A, L·Br]
    A = x.shape[0]
    xpl = _planes(x)                     # once per ct (limb-independent)

    def stage1_sums(g):
        nl = min(lg, L - g)
        Wg = [[w1s_ref[0, d, f, pl.ds(g * A, nl * A), :] for f in range(4)]
              for d in range(4)]
        return _matmul_sums(xpl, Wg, left=True)    # 4 × [nl·A, L·Br]

    sums_next = stage1_sums(0) if _KB_PIPE else None
    for g in range(0, L, lg):
        nl = min(lg, L - g)
        if _KB_PIPE:
            sums = sums_next
            if g + lg < L:
                # issue the NEXT group's MXU dots before this group's VPU
                # phase (cross-group software pipeline)
                sums_next = stage1_sums(g + lg)
        else:
            sums = stage1_sums(g)
        # byte-serial exact assembly: value = w0 + 2^16·m (no carry chain)
        w0g, mg = _assemble_w0_m(sums)
        for j in range(nl):
            l = g + j
            q = scalars_ref[l, 0]
            r16 = scalars_ref[l, 1]
            r16s = scalars_ref[l, 2]
            w0_l = w0g[j * A:(j + 1) * A, :]
            m_l = mg[j * A:(j + 1) * A, :]
            tv, ts = t_ref[l], t_s_ref[l]
            t16v, t16s = t16_ref[l], t16s_ref[l]
            two_q = q + q
            blocks_k3 = [[] for _ in range(r)]
            for di in range(L):
                sl = slice(di * Br, (di + 1) * Br)
                # unreduced twiddle: value·T ≡ w0·T + m·(2^16·T)  (mod q);
                # raw + raw ∈ [0, 4q), one 2q-subtract bounds it for the
                # lazy butterfly, whose outputs feed the stage-3
                # digit-plane dots — those reduce ANY u32 exactly, so
                # nothing on this path canonicalizes
                if _KB_ABLATE == "notw":
                    tw = m_l[:, sl]
                else:
                    t_raw = (_shoup_raw(w0_l[:, sl], tv, ts, q)
                             + _shoup_raw(m_l[:, sl], t16v, t16s, q))
                    tw = jnp.where(t_raw >= two_q, t_raw - two_q, t_raw)
                if r == 2:
                    b_lo, b_hi = tw[:, :B], tw[:, B:]
                    bs = [b_lo + b_hi, b_lo + two_q - b_hi]   # < 4q, exact
                elif r == 4:
                    # the dft4 mulmod needs canonical operands
                    tw = jnp.where(tw >= q, tw - q, tw)
                    bs = _dft4([tw[:, k * B:(k + 1) * B] for k in range(4)],
                               scalars_ref[l, 5], scalars_ref[l, 6], q)
                else:
                    bs = [tw]
                for k3 in range(r):
                    blocks_k3[k3].append(bs[k3])
            w2f = [
                [[w2f_refs[k3][l, d, f] for f in range(4)] for d in range(4)]
                for k3 in range(r)
            ]
            for k3 in range(r):
                zin = (jnp.concatenate(blocks_k3[k3], axis=0)
                       if L > 1 else blocks_k3[k3][0])      # [L·A, B]
                s3 = _matmul_sums(_planes(zin), w2f[k3], left=False)
                if _KB_ABLATE == "norecomb3":
                    z = s3[0]
                else:
                    # congruent-unreduced is fine: the only consumer is the
                    # hint Shoup product, exact for any u32
                    z = _recombine_sums_fast(s3, q, r16, r16s)
                ks = slice(k3 * B, (k3 + 1) * B)
                # lazy accumulation: raw Shoup products in [0, 2q), one
                # 2q-subtract per add keeps the invariant, one final
                # q-subtract canonicalizes (outputs stay bit-identical)
                o0 = c0_ref[0, l][:, ks]
                o1 = c1_ref[0, l][:, ks]
                for di in range(L):
                    zd = z[di * A:(di + 1) * A, :]
                    if _KB_ABLATE == "nohint":
                        o0 = _addmod(o0, zd, q)
                        o1 = _addmod(o1, zd, q)
                    else:
                        o0 = o0 + _shoup_raw(zd, hb_ref[di, l][:, ks],
                                             hbs_ref[di, l][:, ks], q)
                        o0 = jnp.where(o0 >= two_q, o0 - two_q, o0)
                        o1 = o1 + _shoup_raw(zd, ha_ref[di, l][:, ks],
                                             has_ref[di, l][:, ks], q)
                        o1 = jnp.where(o1 >= two_q, o1 - two_q, o1)
                o0 = jnp.where(o0 >= q, o0 - q, o0)
                o1 = jnp.where(o1 >= q, o1 - q, o1)
                out_ref[0, 0, l, :, ks] = o0
                out_ref[0, 1, l, :, ks] = o1


def _limb_spec(shape):
    return pl.BlockSpec((1, *shape), lambda l: (l, *([0] * len(shape))),
                        memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda l: tuple([0] * len(shape)),
                        memory_space=pltpu.VMEM)


#: max ciphertexts per fused call (VMEM: the packed digit-coefficient block
#: is 8 MB per ct at the 2^15/L=8 config; larger batches chunk)
MAX_BATCH = 4


def max_batch(n: int, L: int, shoup: bool = False) -> int:
    """Per-call ciphertext cap so kernel B's VMEM working set fits: hints +
    digit scratch + tables are batch-independent; c2c/c0/c1/out scale with
    the batch.

    Raw hints keep the conservative 16 MB scoped budget (4 cts at 2^15/L=8;
    1 at 2^16/L=8). The shoup path raises vmem_limit_bytes to 100 MB (v5e
    has the headroom) and batches up to 16 cts per fused call — measured
    284 us/ct (3522 ops/s) at Bt=16 vs 345 us/ct at the raw path's Bt=4;
    Bt=32 fails to compile (kernel A's input streams).

    CAVEAT: the 90-of-100 MB usable figure and the 'Bt=16 compiles at 2^15'
    bytes_cap anchor are EMPIRICAL constants for the Mosaic compiler
    shipped with jax 0.9 on v5e — a compiler update or an untested ring
    size could admit a batch that then fails to compile. Callers that must
    degrade gracefully (bench.py, the fused-batch `mul_relin` chunker)
    should catch the Mosaic compile error and retry at half batch; the
    min(16, ...) clamp bounds the blast radius."""
    if shoup:
        fixed = 4 * n * L * 5 + (6 << 20)   # 4 hint slices + scratch + tables
        per_ct = 4 * n * (L + 4)
        avail = (90 << 20) - fixed
        # kernel A's input streams cap the batch-bytes: Bt=16 compiles at
        # 2^15, Bt=32 does not — scale the cap with the ring size
        bytes_cap = max(1, (16 * (1 << 15)) // n)
        return max(1, min(16, bytes_cap, avail // per_ct))
    fixed = 4 * n * L * 3 + (3 << 20)       # 2 hint slices + scratch + tables
    per_ct = 4 * n * (L + 4)                # c2c block + c0/c1 + out
    avail = (14 << 20) - fixed              # headroom under the 16 MB VMEM
    return max(1, min(MAX_BATCH, avail // per_ct))


def _batch_spec(bt, shape):
    return pl.BlockSpec((bt, 1, *shape), lambda l: (0, l, *([0] * len(shape))),
                        memory_space=pltpu.VMEM)


def _tensor_intt_call(p, ct_a, ct_b):
    """Kernel A: tensor product + iNTT(c2) over the base chain. Returns
    (c0, c1) as [Bt, L, A, Br] NTT-domain grids and c2c [Bt, A, L·Br]
    packed coefficient blocks (limb-major columns)."""
    n, qs = p.n, p.qs
    L = len(qs)
    t = _pallas3_tables(n, qs)
    A, B, r = t["A"], t["B"], t["r"]
    Br = B * r
    Bt = ct_a.shape[0]
    g = (Bt, L, A, Br)
    # contiguity-preserving reshapes only — the kernel slices components
    # itself, so XLA inserts no slice/copy fusions on the inputs
    ca = ct_a.reshape(Bt, 2, L, A, Br)
    cb = ct_b.reshape(Bt, 2, L, A, Br)
    ct_spec = pl.BlockSpec((Bt, 2, 1, A, Br),
                           lambda l: (0, 0, l, 0, 0),
                           memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((L, 9), lambda l: (0, 0), memory_space=pltpu.SMEM)

    use_bd = t["w2if_bd"] is not None
    if use_bd:
        w2_tabs = (t["w2if_bd"],)
        w2_specs = [_limb_spec((4, 4, Br, Br))]
    else:
        w2_tabs = tuple(t["w2if"])
        w2_specs = [_limb_spec((4, 4, B, B)) for _ in range(r)]
    return pl.pallas_call(
        partial(_tensor_intt_kernel, r=r, B=B, bt=Bt, nlimb=L,
                use_bd=use_bd, fast_rec=recombine_fast_ok(qs)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 << 20) if Bt > 4 else None),
        grid=(L,),
        in_specs=[
            smem,
            ct_spec, ct_spec,
            *w2_specs,
            _limb_spec((A, Br)), _limb_spec((A, Br)),
            _limb_spec((4, 4, A, A)),
        ],
        out_specs=[
            _batch_spec(Bt, (A, Br)), _batch_spec(Bt, (A, Br)),
            _full_spec((Bt, A, L * Br)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(g, jnp.uint32),
            jax.ShapeDtypeStruct(g, jnp.uint32),
            jax.ShapeDtypeStruct((Bt, A, L * Br), jnp.uint32),
        ],
    )(t["scal"], ca, cb, *w2_tabs, t["Ti"], t["Ti_s"], t["w1i"])


def _limb_spec2(shape):
    return pl.BlockSpec((1, *shape), lambda l, c: (l, *([0] * len(shape))),
                        memory_space=pltpu.VMEM)


def _mul_relin_ctmajor(p, t, c0, c1, c2c, hint_b, hint_a):
    """pallas_call wrapper for _digit_relin_ctmajor_kernel: grid (Bt,),
    hints/tables resident (constant index maps), per-ct streams."""
    n, qs = p.n, p.qs
    L = len(qs)
    A, B, r = t["A"], t["B"], t["r"]
    Br = B * r
    Bt = c2c.shape[0]
    lg = max(1, min(_KB_LG, L))
    hints = [h.reshape(L, L, A, Br)
             for h in (hint_b[0], hint_b[1], hint_a[0], hint_a[1])]
    smem = pl.BlockSpec((L, 9), lambda b: (0, 0), memory_space=pltpu.SMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_digit_relin_ctmajor_kernel, r=r, B=B, L=L, lg=lg),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(_KB_VMEM_MB << 20)),
        grid=(Bt,),
        in_specs=[
            smem,
            pl.BlockSpec((1, A, L * Br), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, A, Br), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, A, Br), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, 4, 4, L * A, A)),
            const((L, A, Br)), const((L, A, Br)),
            const((L, A, Br)), const((L, A, Br)),
            *[const((L, 4, 4, B, B)) for _ in range(r)],
            *[const((L, L, A, Br)) for _ in hints],
        ],
        # output directly in the caller's [Bt, 2, L, n] layout — no
        # moveaxis copy after the kernel
        out_specs=pl.BlockSpec((1, 2, L, A, Br),
                               lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bt, 2, L, A, Br), jnp.uint32),
    )(t["scal"], c2c, c0, c1, t["w1s"][None], t["T"], t["T_s"],
      t["T16"], t["T16_s"], *t["w2f"], *hints)
    return out.reshape(Bt, 2, L, n)


@partial(jax.jit, static_argnums=(0,))
def _mul_relin_pallas_one(p, ct_a, ct_b, hint_b, hint_a):
    """One fused call over a static batch [Bt, 2, L, n] (Bt ≤ MAX_BATCH).
    Hints are raw [L, L, n] values or (values, companions) Shoup pairs
    (fast.relin_hint(..., shoup=True) — the faster hint-product path)."""
    n, qs = p.n, p.qs
    L = len(qs)
    t = _pallas3_tables(n, qs)
    A, B, r = t["A"], t["B"], t["r"]
    Br = B * r
    Bt = ct_a.shape[0]
    shoup_hints = isinstance(hint_b, (tuple, list))
    c0, c1, c2c = _tensor_intt_call(p, ct_a, ct_b)

    # ct-major kernel (VERDICT r5 lever): hoisted limb-independent planes,
    # stacked stage-1, unreduced twiddle, resident hints, SSA limb
    # independence — applies at the headline configs (single digit chunk,
    # Shoup hints that fit VMEM)
    hint_mb = 16 * L * L * n / (1 << 20)   # 4 u32 streams
    if (_KB_CTMAJOR and shoup_hints and L * Br <= _KB_CTMAJOR_LANES
            and hint_mb <= _KB_CTMAJOR_HINT_MB and recombine_fast_ok(qs)):
        return _mul_relin_ctmajor(p, t, c0, c1, c2c, hint_b, hint_a)

    # digit-chunked grid: dc digits per step (≤ 2048 lanes for the stage-1
    # wide dot); VMEM is chunk-sized, independent of L. Shrink dc until the
    # estimated working set (double-buffered c2c chunk + hint rows + in/out
    # streams + scratch + ~3.5 MB tables/stack) fits the 16 MB scoped VMEM.
    # dc·Br ≤ 2048 bounds the stage-1 wide dot's live f32 plane sums; when
    # the chunk grid has > 1 step the c2c/hint chunk streams double-buffer,
    # so halve the chunk to stay inside the 16 MB scoped budget (measured:
    # L=8/r=2 fits at dc=8 single-chunk; L=16/r=2 at dc=8 and L=8/r=4 at
    # dc=4 exceed it by < 1 MB — one halving clears both)
    dc = min(max(1, 2048 // Br), L)
    if L > dc:
        dc = max(1, dc // 2)
    C = -(-L // dc)
    D_pad = C * dc

    def _pad_rows(h):
        h = h.reshape(L, L, A, Br)
        if D_pad == L:
            return h
        zrows = jnp.zeros((D_pad - L, L, A, Br), jnp.uint32)
        return jnp.concatenate([h, zrows], axis=0)

    if shoup_hints:
        hints = [_pad_rows(hint_b[0]), _pad_rows(hint_b[1]),
                 _pad_rows(hint_a[0]), _pad_rows(hint_a[1])]
    else:
        hints = [_pad_rows(hint_b), _pad_rows(hint_a)]
    if D_pad != L:
        c2c = jnp.concatenate(
            [c2c, jnp.zeros((Bt, A, (D_pad - L) * Br), jnp.uint32)], axis=-1)
    smem = pl.BlockSpec((L, 9), lambda l, c: (0, 0), memory_space=pltpu.SMEM)
    dig_spec = pl.BlockSpec((dc, 1, A, Br), lambda l, c: (c, l, 0, 0),
                            memory_space=pltpu.VMEM)
    batch2 = lambda shape: pl.BlockSpec(
        (Bt, 1, *shape), lambda l, c: (0, l, *([0] * len(shape))),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_digit_relin_kernel, dc=dc, r=r, B=B, bt=Bt,
                shoup=shoup_hints, fast_rec=recombine_fast_ok(qs)),
        # the 16 MB scoped-VMEM default rejects the 4 double-buffered hint
        # streams of the shoup path at Bt=4 (18.7 MB measured); v5e has
        # VMEM headroom beyond the default — raise the cap for this kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 << 20) if (shoup_hints or Bt > 4) else None),
        grid=(L, C),
        in_specs=[
            smem,
            pl.BlockSpec((Bt, A, dc * Br), lambda l, c: (0, 0, c),
                         memory_space=pltpu.VMEM),   # chunk's digit columns
            batch2((A, Br)), batch2((A, Br)),
            _limb_spec2((4, 4, A, A)),
            _limb_spec2((A, Br)), _limb_spec2((A, Br)),
            *[_limb_spec2((4, 4, B, B)) for _ in range(r)],
            *[dig_spec for _ in hints],
        ],
        out_specs=pl.BlockSpec((2, Bt, 1, A, Br),
                               lambda l, c: (0, 0, l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, Bt, L, A, Br), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((dc * A, B), jnp.uint32)
                        for _ in range(r)],
    )(t["scal"], c2c, c0, c1, t["w1"], t["T"], t["T_s"],
      *t["w2f"], *hints)
    return jnp.moveaxis(out.reshape(2, Bt, L, n), 0, 1)


def _hybrid_digit_relin_kernel(scalars_ref, extw_ref, extws_ref, x_ref,
                               w1_ref, t_ref, t_s_ref, *rest_refs,
                               gidx: tuple, r: int, B: int, bt: int,
                               shoup: bool = False, fast_rec: bool = False):
    """Per-extended-limb forward NTTs of the dnum hybrid digits + hint inner
    product (she/hybrid.py dataflow). Hybrid digits are limb-DEPENDENT
    (D_j < Q_j overflows u32), so the unreduced-digit trick of
    _digit_relin_kernel does not apply directly; instead x_ref packs the
    limb-independent Garner digit vectors x_{j,k} [Bt, A, nxs·Br] and the
    per-limb digit residues Σ_k x_{j,k}·[π_k]_{q_l} are built in VMEM from
    SMEM constants (a few Shoup mults), then the same wide-dot NTT stages
    run with D = dnum digits, accumulating from zero (c0/c1 join after the
    P-rescale)."""
    ndig = len(gidx)
    w2f_refs = rest_refs[:r]
    if shoup:
        hb_ref, hbs_ref, ha_ref, has_ref = rest_refs[r:r + 4]
        out_ref = rest_refs[r + 4]
        ext_scr = rest_refs[r + 5]
        scr_refs = rest_refs[r + 6:r + 6 + r]
    else:
        hb_ref, ha_ref, out_ref = rest_refs[r], rest_refs[r + 1], rest_refs[r + 2]
        ext_scr = rest_refs[r + 3]
        scr_refs = rest_refs[r + 4:r + 4 + r]
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
    Br = r * B
    for b_i in range(bt):
        # base extension: digit j's residues mod q_l from its Garner vectors
        for j, (st, cnt) in enumerate(gidx):
            acc = None
            for k in range(cnt):
                xk = x_ref[b_i, :, (st + k) * Br:(st + k + 1) * Br]
                term = _shoup(xk, extw_ref[l, st + k], extws_ref[l, st + k], q)
                acc = term if acc is None else _addmod(acc, term, q)
            ext_scr[:, j * Br:(j + 1) * Br] = acc
        # stage 1 on the extension block, chunked over digit groups of
        # ≤ 2048 lanes (see _digit_relin_kernel: scoped-VMEM peak control)
        A = scr_refs[0].shape[0] // ndig
        dchunk = max(1, 2048 // Br)
        for d0 in range(0, ndig, dchunk):
            dc = min(dchunk, ndig - d0)
            s1h = _matmul_sums(
                _planes(ext_scr[:, d0 * Br:(d0 + dc) * Br]), w1, left=True)
            if fast_rec:
                # unreduced: the consumer is the big-twiddle Shoup
                y = _recombine_sums_fast(s1h, q, r16, r16s)
            else:
                y = _recombine_sums(s1h, q, r16, r16s, r32, r32s)
            for di in range(dc):
                d = d0 + di
                yd = _shoup(y[:, di * Br:(di + 1) * Br], t_ref[0], t_s_ref[0],
                            q)
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
                    scr_refs[k3][d * A:(d + 1) * A, :] = blocks[k3]
        out0 = [jnp.zeros((A, B), U32) for _ in range(r)]
        out1 = [jnp.zeros((A, B), U32) for _ in range(r)]
        for k3 in range(r):
            s3h = _matmul_sums(_planes(scr_refs[k3][...]), w2f[k3],
                               left=False)
            if fast_rec:
                # shoup hint products take any u32; the raw-hint general
                # modmul needs canonical operands
                z = _recombine_sums_fast(s3h, q, r16, r16s,
                                         canonical=not shoup)
            else:
                z = _recombine_sums(s3h, q, r16, r16s, r32, r32s)
            for d in range(ndig):
                zd = z[d * A:(d + 1) * A, :]
                hb = hb_ref[d, 0][:, k3 * B:(k3 + 1) * B]
                ha = ha_ref[d, 0][:, k3 * B:(k3 + 1) * B]
                if shoup:
                    hbs = hbs_ref[d, 0][:, k3 * B:(k3 + 1) * B]
                    has = has_ref[d, 0][:, k3 * B:(k3 + 1) * B]
                    out0[k3] = _addmod(out0[k3], _shoup(zd, hb, hbs, q), q)
                    out1[k3] = _addmod(out1[k3], _shoup(zd, ha, has, q), q)
                else:
                    out0[k3] = _addmod(
                        out0[k3],
                        _mulmod_gen(zd, hb, q, r16, r16s, r32, r32s), q)
                    out1[k3] = _addmod(
                        out1[k3],
                        _mulmod_gen(zd, ha, q, r16, r16s, r32, r32s), q)
        for k3 in range(r):
            out_ref[0, b_i, 0, :, k3 * B:(k3 + 1) * B] = out0[k3]
            out_ref[1, b_i, 0, :, k3 * B:(k3 + 1) * B] = out1[k3]


@lru_cache(maxsize=None)
def _hybrid_ext_consts(groups: tuple[tuple[int, ...], ...],
                       targets: tuple[int, ...]):
    """SMEM tables [T, nxs]: [π_k^{(j)}]_{q_t} and Shoup companions, for the
    packed Garner digit columns (group-major)."""
    pis = []
    for grp in groups:
        pi = 1
        for g in grp:
            pis.append(pi)
            pi *= g
    w = np.array([[p % q for p in pis] for q in targets], dtype=np.uint32)
    ws = np.array(
        [[shoup_const(p % q, q) for p in pis] for q in targets],
        dtype=np.uint32)
    return w, ws


@partial(jax.jit, static_argnums=(0, 1, 2))
def hybrid_digit_stage_pallas(n: int, ext_qs: tuple[int, ...],
                              groups: tuple[tuple[int, ...], ...],
                              x_pack, hint_b, hint_a):
    """Digit NTTs + hint inner product over the extended chain for hybrid
    key-switching: x_pack [Bt, A, nxs·Br] Garner digit vectors (3-factor
    grid layout, group-major columns), hints [dnum, T, n] NTT domain (raw,
    or (values, companions) Shoup pairs — the fast hint-product path) →
    [2, Bt, T, n] at the extended chain (pre-P-rescale accumulator)."""
    t = _pallas3_tables(n, ext_qs)
    A, B, r = t["A"], t["B"], t["r"]
    Br = B * r
    T = len(ext_qs)
    Bt = x_pack.shape[0]
    ndig = len(groups)
    gidx = []
    st = 0
    for grp in groups:
        gidx.append((st, len(grp)))
        st += len(grp)
    nxs = st
    w, ws = _hybrid_ext_consts(groups, ext_qs)
    smem = pl.BlockSpec((T, 9), lambda l: (0, 0), memory_space=pltpu.SMEM)
    smem_ext = pl.BlockSpec((T, nxs), lambda l: (0, 0),
                            memory_space=pltpu.SMEM)
    shoup_hints = isinstance(hint_b, (tuple, list))
    if shoup_hints:
        hints = [hint_b[0], hint_b[1], hint_a[0], hint_a[1]]
    else:
        hints = [hint_b, hint_a]
    hints = [h.reshape(ndig, T, A, Br) for h in hints]
    dig_spec = pl.BlockSpec((ndig, 1, A, Br), lambda l: (0, l, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_hybrid_digit_relin_kernel, gidx=tuple(gidx), r=r, B=B,
                bt=Bt, shoup=shoup_hints, fast_rec=recombine_fast_ok(ext_qs)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 << 20) if shoup_hints else None),
        grid=(T,),
        in_specs=[
            smem, smem_ext, smem_ext,
            _full_spec((Bt, A, nxs * Br)),
            _limb_spec((4, 4, A, A)),
            _limb_spec((A, Br)), _limb_spec((A, Br)),
            *[_limb_spec((4, 4, B, B)) for _ in range(r)],
            *[dig_spec for _ in hints],
        ],
        out_specs=pl.BlockSpec((2, Bt, 1, A, Br), lambda l: (0, 0, l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, Bt, T, A, Br), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((A, ndig * Br), jnp.uint32)]
        + [pltpu.VMEM((ndig * A, B), jnp.uint32) for _ in range(r)],
    )(t["scal"], w, ws, x_pack, t["w1"], t["T"], t["T_s"],
      *t["w2f"], *hints)
    return out.reshape(2, Bt, T, n)


def mul_relin_pallas(p, ct_a, ct_b, hint_b, hint_a):
    """Fused multiply+relinearize, [2, L, n] or batched [Bt, 2, L, n] cts
    (3-factor NTT domain); hints are raw u32 [L, L, n] or (values,
    companions) Shoup pairs. Bit-identical to she/fast.mul_relin with
    impl="pallas" on the same inputs for either hint layout.

    Batches larger than the VMEM cap (max_batch) chunk through `lax.map`:
    the while-loop SERIALIZES the fused calls — unrolled chunk calls let the
    XLA scheduler overlap neighboring kernels' scoped-VMEM stacks and blow
    the 16 MB limit at large batches (observed at batch=256) — and compiles
    the kernel pair once regardless of batch."""
    if ct_a.ndim == 3:
        return _mul_relin_pallas_one(
            p, ct_a[None], ct_b[None], hint_b, hint_a)[0]
    Bt = ct_a.shape[0]
    cap = max_batch(p.n, len(p.qs), shoup=isinstance(hint_b, (tuple, list)))
    if Bt <= cap:
        return _mul_relin_pallas_one(p, ct_a, ct_b, hint_b, hint_a)
    main = (Bt // cap) * cap

    def chunk(ab):
        return _mul_relin_pallas_one(p, ab[0], ab[1], hint_b, hint_a)

    sh = (Bt // cap, cap, *ct_a.shape[1:])
    out = jax.lax.map(
        chunk, (ct_a[:main].reshape(sh), ct_b[:main].reshape(sh)))
    out = out.reshape(main, *ct_a.shape[1:])
    if main == Bt:
        return out
    rest = _mul_relin_pallas_one(
        p, ct_a[main:], ct_b[main:], hint_b, hint_a)
    return jnp.concatenate([out, rest], axis=0)
