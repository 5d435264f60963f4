"""Distributed BGV hot path: shard_map over the ('batch','limb','coeff') mesh.

The distributed NTT is the 4-step factorization n = n1·n2 (SURVEY.md §5):
coefficients are stored in (j2, j1) grid order (pos = j2·n1 + j1) and the
'coeff' mesh axis shards j2-blocks, so

  1. local cyclic NTT of size n1 along j1 (rows are complete locally),
  2. local twiddle by w^(j2·k1),
  3. ONE all_to_all transpose over ICI (k1 becomes the sharded axis),
  4. local cyclic NTT of size n2 along j2,

with the negacyclic ψ-twist as sharded elementwise pre/post tables. The
final slot order is (k1-bitrev, k2-bitrev) blocks — fixed and self-inverse,
which is all pointwise ct ops need.

Relinearization traffic: one all_gather of the c2 coefficient rows over
'limb' (digits are elementwise per coefficient, so 'coeff' stays sharded);
hint products are limb-local. 'batch' never communicates.

All per-limb constants (twiddles, q, Barrett consts, hints) enter as sharded
*arguments* so a single shard_map trace serves every device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from alchemy_tpu.backend.ntt import (
    cyclic_intt_stages,
    cyclic_ntt_stages,
)
from alchemy_tpu.backend.xla import _cond_sub, _split, mulmod_shoup, shoup_const
from alchemy_tpu.nt.primes import root_of_unity
from alchemy_tpu.she.fast import FastParams


def _bitrev(i: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (i & 1)
        i >>= 1
    return r


@dataclass(frozen=True)
class DistConfig:
    p: FastParams
    n1: int
    n2: int

    def __post_init__(self):
        assert self.n1 * self.n2 == self.p.n


@lru_cache(maxsize=None)
def dist_tables(cfg: DistConfig):
    """Host numpy tables for the 4-step distributed negacyclic NTT.

    Layout-sensitive tables are in storage order and sharded like the data;
    stage tables are per-limb [L, m] (sharded over 'limb')."""
    p, n1, n2 = cfg.p, cfg.n1, cfg.n2
    qs, n = p.qs, p.n
    L = len(qs)
    b1 = n1.bit_length() - 1
    b2 = n2.bit_length() - 1

    def shoup_vec(vals, q):
        return np.array([(int(v) << 32) // q for v in vals], dtype=np.uint32)

    pre = np.empty((L, n), dtype=np.uint32)
    pre_s = np.empty((L, n), dtype=np.uint32)
    post = np.empty((L, n), dtype=np.uint32)
    post_s = np.empty((L, n), dtype=np.uint32)
    tw = np.empty((L, n2, n1), dtype=np.uint32)
    tw_s = np.empty((L, n2, n1), dtype=np.uint32)
    itw = np.empty((L, n2, n1), dtype=np.uint32)
    itw_s = np.empty((L, n2, n1), dtype=np.uint32)
    stage1, stage1_i, stage2, stage2_i = [], [], [], []
    for li, q in enumerate(qs):
        psi = root_of_unity(2 * n, q)
        w = psi * psi % q
        psi_inv = pow(psi, -1, q)
        n_inv = pow(n, -1, q)
        # pre/post twist in storage order pos = j2*n1 + j1, j = j1*n2 + j2
        for j2 in range(n2):
            for j1 in range(n1):
                j = j1 * n2 + j2
                pos = j2 * n1 + j1
                v = pow(psi, j, q)
                pre[li, pos] = v
                pre_s[li, pos] = (v << 32) // q
                u = pow(psi_inv, j, q) * n_inv % q
                post[li, pos] = u
                post_s[li, pos] = (u << 32) // q
        # step-2 twiddles w^(j2 * brv(k1pos)) at [j2, k1pos]
        for j2 in range(n2):
            for k1pos in range(n1):
                k1 = _bitrev(k1pos, b1)
                v = pow(w, j2 * k1, q)
                tw[li, j2, k1pos] = v
                tw_s[li, j2, k1pos] = (v << 32) // q
                u = pow(v, -1, q)
                itw[li, j2, k1pos] = u
                itw_s[li, j2, k1pos] = (u << 32) // q

    def stages_for(root_pows):
        """stage tables [L, m] per stage for a cyclic NTT with per-limb roots."""
        size = len(root_pows[0])
        k = size.bit_length() - 1
        # root_pows[l] = [root^j for j in range(size)] mod q_l
        out = []
        for s in range(k):
            m = size >> (s + 1)
            Wl, WSl = [], []
            for li, q in enumerate(qs):
                vals = [root_pows[li][(j * (1 << s)) % size] for j in range(m)]
                Wl.append(np.array(vals, dtype=np.uint32))
                WSl.append(shoup_vec(vals, q))
            out.append((np.stack(Wl), np.stack(WSl)))
        return out

    def root_table(order_exp):
        # per limb: powers of w^(n/size)
        tabs = []
        for q in qs:
            psi = root_of_unity(2 * n, q)
            w = psi * psi % q
            r = pow(w, order_exp, q)
            size = n // order_exp
            vals = [1] * size
            for j in range(1, size):
                vals[j] = vals[j - 1] * r % q
            tabs.append(vals)
        return tabs

    w1_pows = root_table(n2)  # order n1
    w2_pows = root_table(n1)  # order n2
    stage1 = stages_for(w1_pows)
    stage2 = stages_for(w2_pows)

    def inv_stages(stage_tabs):
        out = []
        for W, WS in stage_tabs:
            Wi = np.empty_like(W)
            WSi = np.empty_like(WS)
            for li, q in enumerate(qs):
                inv = [pow(int(v), -1, q) for v in W[li]]
                Wi[li] = np.array(inv, dtype=np.uint32)
                WSi[li] = shoup_vec(inv, q)
            out.append((Wi, WSi))
        return out

    qcol = np.array(qs, dtype=np.uint32)[:, None]
    r16 = np.array([(1 << 16) % q for q in qs], dtype=np.uint32)[:, None]
    r16s = np.array([shoup_const((1 << 16) % q, q) for q in qs], dtype=np.uint32)[:, None]
    return {
        "pre": (pre, pre_s),
        "post": (post, post_s),
        "tw": (tw.reshape(L, n), tw_s.reshape(L, n)),
        "itw": (itw.reshape(L, n), itw_s.reshape(L, n)),
        "stage1": stage1,
        "stage1_inv": inv_stages(stage1),
        "stage2": stage2,
        "stage2_inv": inv_stages(stage2),
        "q": qcol,
        "r16": r16,
        "r16s": r16s,
    }


# ---------------------------------------------------------------------------
# local (per-shard) transforms, written against local chunk shapes
# ---------------------------------------------------------------------------


def _a2a(x, axis_split, axis_concat, n_shards=None):
    return jax.lax.all_to_all(
        x, "coeff", split_axis=axis_split, concat_axis=axis_concat, tiled=True
    )


def _a2a_ring(x, axis_split, axis_concat, n_shards):
    """Staged-ring transpose: the bandwidth-optimal ppermute decomposition of
    the tiled all_to_all (SURVEY.md §2.4 ring-attention/Ulysses row — the
    FHE analog of the ring-pipeline strategy; bit-identical result).

    Round t ∈ 1..C-1 sends exactly one [split/C × concat] chunk one hop of
    distance t: device d ships chunk index (d+t)%C to device (d+t)%C, which
    lands it at source-block position (r-t)%C of the output. Total bytes
    moved equal the all_to_all's (C-1)/C of the block; C-1 neighbor-style
    rounds instead of one global exchange. Measured no faster than a2a on
    any reachable transport (STRATEGY_r04.json) — kept as an explicit
    opt-in (strategy="ring") for transports where staged neighbor exchange
    might win."""
    C = n_shards
    d = jax.lax.axis_index("coeff")
    chunk = x.shape[axis_split] // C
    cat = x.shape[axis_concat]
    out_shape = list(x.shape)
    out_shape[axis_split] = chunk
    out_shape[axis_concat] = cat * C
    out = jnp.zeros(tuple(out_shape), x.dtype)
    for t in range(C):
        src_idx = (d + t) % C
        piece = jax.lax.dynamic_slice_in_dim(
            x, src_idx * chunk, chunk, axis=axis_split)
        if t:
            piece = jax.lax.ppermute(
                piece, "coeff", [(i, (i + t) % C) for i in range(C)])
        out = jax.lax.dynamic_update_slice_in_dim(
            out, piece, ((d - t) % C) * cat, axis=axis_concat)
    return out


#: DistNTT strategy registry (SURVEY §2.4: "both implemented under one
#: DistNTT interface; pick by slice topology")
DIST_STRATEGIES = {"a2a": _a2a, "ring": _a2a_ring}


def pick_dist_strategy(mesh: Mesh) -> str:
    """Default transpose strategy: a2a, everywhere — measured, not assumed.

    The staged ring was hypothesized to pipeline better across process/DCN
    boundaries; the data says otherwise on every transport this repo can
    reach: single-process virtual mesh ring is slower at ≥4 coeff shards
    (SCALING_r03.json: 47.1 ms a2a vs 48.8 ring at 4 shards, 68.4 vs 80.9
    at 8) and across a REAL 2-process gloo boundary it is a wash-to-slower
    (STRATEGY_r04.json via scripts/bench_strategy.py: ring/a2a = 0.98 at
    2^12, 1.07 at 2^14). The ring variant stays available explicitly
    (strategy="ring", bit-identical) for transports where staged neighbor
    exchange might win; re-run scripts/bench_strategy.py before preferring
    it."""
    return "a2a"


def _stages_L(x, stages, q, fn):
    """Apply a cyclic stage transform over the last axis of
    [..., L_loc, G, size] (G = grid rows) with per-limb tables [L_loc, m]:
    temporarily move L next to the transform axis for broadcasting."""
    x = jnp.swapaxes(x, -3, -2)  # [..., G, L_loc, size]
    x = fn(x, stages, q)
    return jnp.swapaxes(x, -3, -2)


def _overlap_chunks(strategy: str, n_shards: int | None, dim: int) -> int:
    """Number of destination-aligned transpose chunks (1 = unchunked).

    overlap > 1 splits the all_to_all into `overlap` independent
    exchange+compute chains so XLA's async-collective scheduler can run
    chunk k's transpose while chunk k-1's post-transpose butterflies
    compute (the standard comm/compute double-buffering lever; VERDICT r4
    missing #2). Worth it when the per-device payload is large relative to
    the per-collective launch latency (big batches / rings); at tiny
    payloads the extra launches dominate — hence default OFF and opt-in via
    ALCHEMY_DIST_OVERLAP (the batch-threshold analysis lives in
    SCALING_r05.json)."""
    import os

    nc = int(os.environ.get("ALCHEMY_DIST_OVERLAP", "1"))
    if nc <= 1 or strategy != "a2a" or not n_shards:
        return 1
    while nc > 1 and dim % (n_shards * nc) != 0:
        nc //= 2
    return max(1, nc)


def _dist_ntt_local(x, t, cfg: DistConfig, strategy: str = "a2a",
                    n_shards: int | None = None):
    """x local [..., L_loc, n_loc] in (j2, j1) storage order."""
    xpose = DIST_STRATEGIES[strategy]
    n1 = cfg.n1
    q = t["q"]
    pre, pre_s = t["pre"]
    x = mulmod_shoup(x, pre, pre_s, q)
    lead = x.shape[:-2]
    Lc = x.shape[-2]
    n2_loc = x.shape[-1] // n1
    x = x.reshape(*lead, Lc, n2_loc, n1)
    x = _stages_L(x, t["stage1"], q, cyclic_ntt_stages)   # over j1 → k1pos
    twv, tws = t["tw"]
    x = mulmod_shoup(x.reshape(*lead, Lc, n2_loc * n1), twv, tws, q).reshape(
        *lead, Lc, n2_loc, n1
    )
    nc = _overlap_chunks(strategy, n_shards, n1)
    if nc > 1:
        # destination-aligned chunking: original column c·(nc·ncc) + k·ncc
        # + j lands on device c either way, so each chunk's exchange is a
        # C-way a2a of a column subset and the concatenated result is
        # bit-identical to the one-shot transpose. The nc exchange+stage-2
        # chains are dataflow-independent — async a2a overlaps them.
        C = n_shards
        ncc = n1 // (C * nc)
        x6 = x.reshape(*lead, Lc, n2_loc, C, nc, ncc)
        chunks = []
        for k in range(nc):
            xk = x6[..., k, :]                  # [..., L, n2_loc, C, ncc]
            yk = jax.lax.all_to_all(xk, "coeff", split_axis=xk.ndim - 2,
                                    concat_axis=xk.ndim - 3, tiled=True)
            yk = yk.reshape(*lead, Lc, n2_loc * C, ncc)
            yk = jnp.swapaxes(yk, -1, -2)       # [..., L, ncc, n2]
            chunks.append(_stages_L(yk, t["stage2"], q, cyclic_ntt_stages))
        x = jnp.concatenate(chunks, axis=-2)    # [..., L, n1/C, n2]
        return x.reshape(*lead, Lc, -1)
    x = xpose(x, x.ndim - 1, x.ndim - 2, n_shards)        # [..., L, n2, n1/C]
    x = jnp.swapaxes(x, -1, -2)                           # [..., L, n1/C, n2]
    x = _stages_L(x, t["stage2"], q, cyclic_ntt_stages)   # over j2 → k2pos
    return x.reshape(*lead, Lc, -1)


def _dist_intt_local(x, t, cfg: DistConfig, strategy: str = "a2a",
                     n_shards: int | None = None):
    xpose = DIST_STRATEGIES[strategy]
    n2 = cfg.n2
    q = t["q"]
    lead = x.shape[:-2]
    Lc = x.shape[-2]
    n1_loc = x.shape[-1] // n2
    x = x.reshape(*lead, Lc, n1_loc, n2)
    x = _stages_L(x, t["stage2_inv"], q, cyclic_intt_stages)  # undo over j2
    x = jnp.swapaxes(x, -1, -2)                               # [..., L, n2, n1/C]
    nc = _overlap_chunks(strategy, n_shards, n2)
    itwv, itws = t["itw"]
    if nc > 1:
        # same destination-aligned chunking as the forward direction:
        # chunk k's exchange overlaps chunk k-1's itw+stage-1 butterflies
        C = n_shards
        ncc = n2 // (C * nc)
        x6 = x.reshape(*lead, Lc, C, nc, ncc, n1_loc)
        itw6 = itwv.reshape(Lc, nc, ncc * C * n1_loc)
        itws6 = itws.reshape(Lc, nc, ncc * C * n1_loc)
        chunks = []
        for k in range(nc):
            xk = x6[..., k, :, :]               # [..., L, C, ncc, n1_loc]
            yk = jax.lax.all_to_all(xk, "coeff", split_axis=xk.ndim - 3,
                                    concat_axis=xk.ndim - 1, tiled=True)
            yk = yk.reshape(*lead, Lc, ncc, C * n1_loc)   # [..., L, ncc, n1]
            n1 = C * n1_loc
            yk = mulmod_shoup(yk.reshape(*lead, Lc, -1),
                              itw6[:, k], itws6[:, k], q).reshape(
                *lead, Lc, ncc, n1)
            chunks.append(
                _stages_L(yk, t["stage1_inv"], q, cyclic_intt_stages))
        x = jnp.concatenate(chunks, axis=-2)    # [..., L, n2/C, n1]
        x = x.reshape(*lead, Lc, -1)
        post, post_s = t["post"]
        return mulmod_shoup(x, post, post_s, q)
    x = xpose(x, x.ndim - 2, x.ndim - 1, n_shards)            # [..., L, n2/C, n1]
    n2_loc, n1 = x.shape[-2], x.shape[-1]
    x = mulmod_shoup(x.reshape(*lead, Lc, -1), itwv, itws, q).reshape(
        *lead, Lc, n2_loc, n1
    )
    x = _stages_L(x, t["stage1_inv"], q, cyclic_intt_stages)  # undo over j1
    x = x.reshape(*lead, Lc, -1)
    post, post_s = t["post"]
    return mulmod_shoup(x, post, post_s, q)


def _reduce_u32_local(v, q, r16, r16s):
    ll, lh = _split(v)
    return _cond_sub(mulmod_shoup(lh, r16, r16s, q) + ll, q)


def _mul(a, b, t):
    from alchemy_tpu.backend.xla import mul_u32_hilo

    q = t["q"]
    hi, lo = mul_u32_hilo(a, b)
    # hi·2^32 mod q: reduce hi (<2^30), then two ·2^16 Shoup multiplies
    h1 = _reduce_u32_local(hi, q, t["r16"], t["r16s"])
    h2 = mulmod_shoup(h1, t["r16"], t["r16s"], q)
    h3 = mulmod_shoup(h2, t["r16"], t["r16s"], q)
    ll, lh = _split(lo)
    t2 = _cond_sub(mulmod_shoup(lh, t["r16"], t["r16s"], q) + ll, q)
    return _cond_sub(h3 + t2, q)


def _add(a, b, q):
    return _cond_sub(a + b, q)


# ---------------------------------------------------------------------------
# the sharded fused step
# ---------------------------------------------------------------------------


def make_dist_mul_relin(cfg: DistConfig, mesh: Mesh, strategy: str | None = None,
                        hint_placement: str = "digit"):
    """Build a jitted, mesh-sharded batched mul+relin:
    cts [B, 2, L, n] × hints [L, L, n] → [B, 2, L, n].

    hint_placement (SURVEY.md §2.4 EP-analog row):
    - "digit" (default): hint gadget-row axis replicated, target-limb and
      coefficient axes sharded; one all_gather of the c2 coefficient rows
      over 'limb' per relin. Hint HBM per device = L·L_loc·n_loc·4 B.
    - "row": hint GADGET ROWS sharded over 'limb' — each device holds only
      its own digits' rows (at all target limbs) and computes their digit
      NTTs + partial hint products; ONE psum over 'limb' combines. Hint HBM
      per device drops by limb_shards× (the oversized-hint placement);
      traffic trades the row all_gather for a 2×-larger psum."""
    strategy = strategy or pick_dist_strategy(mesh)
    C = mesh.shape["coeff"]
    LS = mesh.shape["limb"]
    t = dist_tables(cfg)
    L = len(cfg.p.qs)

    tab_specs = _tab_specs(t)
    ct_spec = P("batch", None, "limb", "coeff")

    if hint_placement == "row":
        assert L % LS == 0 and LS & (LS - 1) == 0
        L_loc = L // LS
        hint_spec = P("limb", None, "coeff")
        # replicated-limb table specs: the digit NTT in row mode runs over
        # the FULL limb axis on every device (tables are small)
        full_tabs = {
            k: (jax.tree.map(lambda _: P(None, "coeff"), v)
                if k in ("pre", "post", "tw", "itw")
                else jax.tree.map(lambda _: P(None, None), v))
            for k, v in _tab_specs(t).items()
        }

        def step(ct_a, ct_b, hb, ha, tabs, ftabs):
            q = tabs["q"]
            a0, a1 = ct_a[:, 0], ct_a[:, 1]
            b0, b1 = ct_b[:, 0], ct_b[:, 1]
            c0 = _mul(a0, b0, tabs)
            c1 = _add(_mul(a0, b1, tabs), _mul(a1, b0, tabs), q)
            c2 = _mul(a1, b1, tabs)
            c2_coeff = _dist_intt_local(c2, tabs, cfg, strategy, C)
            B_loc = c2_coeff.shape[0]
            fq = ftabs["q"]
            part0 = jnp.zeros((B_loc, L, c2_coeff.shape[-1]), jnp.uint32)
            part1 = jnp.zeros_like(part0)
            for i_loc in range(L_loc):
                row = c2_coeff[:, i_loc:i_loc + 1, :]
                dig = _reduce_u32_local(
                    jnp.broadcast_to(row, part0.shape), fq,
                    ftabs["r16"], ftabs["r16s"])
                dig_ntt = _dist_ntt_local(dig, ftabs, cfg, strategy, C)
                part0 = _add(part0, _mul(dig_ntt, hb[i_loc][None], ftabs), fq)
                part1 = _add(part1, _mul(dig_ntt, ha[i_loc][None], ftabs), fq)
            # mod-q allreduce by recursive doubling: a raw psum would leave
            # values in [0, LS·q) and can wrap uint32 — each hop's _add
            # reduces, staying exact for any mesh size (LS a power of two)
            tot = jnp.stack([part0, part1], axis=1)
            k = 1
            while k < LS:
                peer = jax.lax.ppermute(
                    tot, "limb", [(i, i ^ k) for i in range(LS)])
                tot = _add(tot, peer, fq)
                k *= 2
            li = jax.lax.axis_index("limb")
            own = jax.lax.dynamic_slice_in_dim(tot, li * L_loc, L_loc, axis=2)
            return jnp.stack([_add(c0, own[:, 0], q),
                              _add(c1, own[:, 1], q)], axis=1)

        sharded = jax.shard_map(
            step, mesh=mesh,
            in_specs=(ct_spec, ct_spec, hint_spec, hint_spec, tab_specs,
                      full_tabs),
            out_specs=ct_spec,
        )

        @jax.jit
        def run(ct_a, ct_b, hb, ha):
            return sharded(ct_a, ct_b, hb, ha, t, t)

        return run

    hint_spec = P(None, "limb", "coeff")

    def step(ct_a, ct_b, hb, ha, tabs):
        q = tabs["q"]
        a0, a1 = ct_a[:, 0], ct_a[:, 1]
        b0, b1 = ct_b[:, 0], ct_b[:, 1]
        c0 = _mul(a0, b0, tabs)
        c1 = _add(_mul(a0, b1, tabs), _mul(a1, b0, tabs), q)
        c2 = _mul(a1, b1, tabs)
        c2_coeff = _dist_intt_local(c2, tabs, cfg, strategy, C)  # [B_loc, L_loc, n_loc]
        rows = jax.lax.all_gather(c2_coeff, "limb", axis=1, tiled=True)  # [B, L, n_loc]
        out0, out1 = c0, c1
        for i in range(L):
            row = rows[:, i : i + 1, :]
            dig = _reduce_u32_local(
                jnp.broadcast_to(row, c2_coeff.shape), q, tabs["r16"], tabs["r16s"]
            )
            dig_ntt = _dist_ntt_local(dig, tabs, cfg, strategy, C)
            out0 = _add(out0, _mul(dig_ntt, hb[i][None], tabs), q)
            out1 = _add(out1, _mul(dig_ntt, ha[i][None], tabs), q)
        return jnp.stack([out0, out1], axis=1)

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(ct_spec, ct_spec, hint_spec, hint_spec, tab_specs),
        out_specs=ct_spec,
    )

    @jax.jit
    def run(ct_a, ct_b, hb, ha):
        return sharded(ct_a, ct_b, hb, ha, t)

    return run


def _tab_specs(t):
    return {
        "pre": (P("limb", "coeff"), P("limb", "coeff")),
        "post": (P("limb", "coeff"), P("limb", "coeff")),
        "tw": (P("limb", "coeff"), P("limb", "coeff")),
        "itw": (P("limb", "coeff"), P("limb", "coeff")),
        "stage1": [(P("limb", None), P("limb", None)) for _ in t["stage1"]],
        "stage1_inv": [(P("limb", None), P("limb", None))
                       for _ in t["stage1_inv"]],
        "stage2": [(P("limb", None), P("limb", None)) for _ in t["stage2"]],
        "stage2_inv": [(P("limb", None), P("limb", None))
                       for _ in t["stage2_inv"]],
        "q": P("limb", None),
        "r16": P("limb", None),
        "r16s": P("limb", None),
    }


def make_dist_mul_relin_hybrid(hk, cfg: DistConfig, mesh: Mesh,
                               strategy: str | None = None):
    """Mesh-sharded fused multiply + HYBRID relinearization (VERDICT r3 #3:
    the deep configuration — where hybrid wins 1.38× on one chip — now has
    a multi-chip path instead of falling back to TrivGad).

    cts [B, 2, L, n] (dist storage, base chain) × hints [dnum, T, n]
    (dist NTT domain, extended chain Q·P) → [B, 2, L, n].

    Sharding (SURVEY.md §2.4 TP/EP rows): Garner digits are elementwise per
    coefficient, so 'coeff' stays sharded end-to-end; both the base chain
    (L rows) and the extended chain (T = L+K rows) shard over 'limb'. The
    cross-chip traffic per op: one all_gather of the c2 coefficient rows
    over 'limb' (digit inputs), one all_gather of the accumulator
    coefficients for the joint P-rescale, plus the NTT transposes over
    'coeff'. Semantics identical to she/hybrid.mul_relin_hybrid (exact
    integer Garner lifting — bit-identical across layouts); reference
    semantics keySwitchQuadCirc, Eval.hs:126,133."""
    from alchemy_tpu.she.hybrid import (
        _extend_consts,
        _garner_tables,
        garner_digits,
    )

    strategy = strategy or pick_dist_strategy(mesh)
    C = mesh.shape["coeff"]
    LS = mesh.shape["limb"]
    p, pe = hk.p, hk.pe
    L, T, n = len(p.qs), len(pe.qs), p.n
    K = len(hk.ps)
    assert L % LS == 0 and T % LS == 0, (L, T, LS)
    L_loc = L // LS
    assert cfg.p.qs == p.qs
    cfg_e = DistConfig(
        p=FastParams(n=n, qs=pe.qs, zp=p.zp, impl=p.impl),
        n1=cfg.n1, n2=cfg.n2)
    tb = dist_tables(cfg)
    te = dist_tables(cfg_e)

    drop = hk.ps
    P_int = 1
    for g in drop:
        P_int *= g
    pz = p.zp
    assert pz & (pz - 1) == 0 and pz <= (1 << 16)
    pi_drop, _ = _garner_tables(drop)
    hd = []
    h = P_int // 2
    for g in drop:
        hd.append(h % g)
        h //= g
    inv_P_zp = pow(P_int % pz, -1, pz) if pz > 1 else 0

    # per-group base-extension consts to the extended chain ([α, T, 1])
    ext_w = [_extend_consts(grp, pe.qs)[:2] for grp in hk.groups]
    # dropped-chain extension consts + exact-division consts on base targets
    wd, wds, _ = _extend_consts(drop, p.qs)                      # [K, L, 1]
    P_mod = np.array([[P_int % q] for q in p.qs], dtype=np.uint32)
    P_mod_s = np.array([[shoup_const(P_int % q, q)] for q in p.qs],
                       dtype=np.uint32)
    invP = np.array([[pow(P_int % q, -1, q)] for q in p.qs], dtype=np.uint32)
    invP_s = np.array([[shoup_const(pow(P_int % q, -1, q), q)] for q in p.qs],
                      dtype=np.uint32)
    consts = {
        "ext_w": [list(wpair) for wpair in ext_w],
        "wd": [wd, wds],
        "P_mod": P_mod, "P_mod_s": P_mod_s,
        "invP": invP, "invP_s": invP_s,
    }
    const_specs = {
        "ext_w": [[P(None, "limb", None)] * 2 for _ in ext_w],
        "wd": [P(None, "limb", None)] * 2,
        "P_mod": P("limb", None), "P_mod_s": P("limb", None),
        "invP": P("limb", None), "invP_s": P("limb", None),
    }
    maskp = np.uint32(pz - 1)
    pz32 = np.uint32(pz)

    def step(ct_a, ct_b, hb, ha, tabs_b, tabs_e, cs):
        qb = tabs_b["q"]
        qe = tabs_e["q"]
        a0, a1 = ct_a[:, 0], ct_a[:, 1]
        b0, b1 = ct_b[:, 0], ct_b[:, 1]
        c0 = _mul(a0, b0, tabs_b)
        c1 = _add(_mul(a0, b1, tabs_b), _mul(a1, b0, tabs_b), qb)
        c2 = _mul(a1, b1, tabs_b)
        c2_coeff = _dist_intt_local(c2, tabs_b, cfg, strategy, C)
        rows = jax.lax.all_gather(c2_coeff, "limb", axis=1, tiled=True)

        # Garner digits per group (identical on every limb shard — cheap
        # elementwise over the local coeff slice), extended to OWN ext rows
        digs = []
        off = 0
        for gi, grp in enumerate(hk.groups):
            xs = garner_digits(rows[:, off:off + len(grp), :], grp)
            off += len(grp)
            w, ws = cs["ext_w"][gi]
            d = None
            for k, x in enumerate(xs):
                term = mulmod_shoup(x[:, None, :], w[k], ws[k], qe)
                d = term if d is None else _cond_sub(d + term, qe)
            digs.append(d)                       # [B, T_loc, n_loc]
        dig = jnp.stack(digs, axis=1)            # [B, dnum, T_loc, n_loc]
        dig_ntt = _dist_ntt_local(dig, tabs_e, cfg_e, strategy, C)

        t0 = t1 = None
        for j in range(len(hk.groups)):
            d = dig_ntt[:, j]
            u0 = _mul(d, hb[j][None], tabs_e)
            u1 = _mul(d, ha[j][None], tabs_e)
            t0 = u0 if t0 is None else _add(t0, u0, qe)
            t1 = u1 if t1 is None else _add(t1, u1, qe)

        # joint P-rescale, distributed (she/hybrid._rescale_joint_jnp math)
        t01 = jnp.stack([t0, t1], axis=1)        # [B, 2, T_loc, n_loc]
        coeff = _dist_intt_local(t01, tabs_e, cfg_e, strategy, C)
        full = jax.lax.all_gather(coeff, "limb", axis=2, tiled=True)
        r = full[:, :, L:, :]                    # K dropped rows
        xs = garner_digits(r, drop)

        gt = jnp.zeros(xs[0].shape, dtype=bool)
        eq = jnp.ones(xs[0].shape, dtype=bool)
        for k in range(K - 1, -1, -1):
            gt = gt | (eq & (xs[k] > np.uint32(hd[k])))
            eq = eq & (xs[k] == np.uint32(hd[k]))
        is_neg = gt

        vz = jnp.zeros_like(xs[0])
        for k, x in enumerate(xs):
            vz = (vz + (x & maskp) * np.uint32(pi_drop[k] % pz)) & maskp
        vz = jnp.where(
            is_neg, (vz + pz32 - np.uint32(P_int % pz)) & maskp, vz)
        tt = (((pz32 - vz) & maskp) * np.uint32(inv_P_zp)) & maskp
        t_neg = tt > pz // 2

        li = jax.lax.axis_index("limb")
        cj = jax.lax.dynamic_slice_in_dim(full, li * L_loc, L_loc, axis=2)
        wdl, wdls = cs["wd"]
        v = None
        for k, x in enumerate(xs):
            term = mulmod_shoup(x[..., None, :], wdl[k], wdls[k], qb)
            v = term if v is None else _cond_sub(v + term, qb)
        vq = jnp.where(
            is_neg[..., None, :],
            jnp.where(v >= cs["P_mod"], v - cs["P_mod"],
                      v + qb - cs["P_mod"]), v)
        ttb = tt[..., None, :]
        tc = jnp.where(t_neg[..., None, :], qb - (pz32 - ttb), ttb)
        qkt = mulmod_shoup(tc, cs["P_mod"], cs["P_mod_s"], qb)
        delta = _cond_sub(vq + qkt, qb)
        diff = jnp.where(cj >= delta, cj - delta, cj + qb - delta)
        res = mulmod_shoup(diff, cs["invP"], cs["invP_s"], qb)
        out01 = _dist_ntt_local(res, tabs_b, cfg, strategy, C)
        return jnp.stack([_add(c0, out01[:, 0], qb),
                          _add(c1, out01[:, 1], qb)], axis=1)

    ct_spec = P("batch", None, "limb", "coeff")
    hint_spec = P(None, "limb", "coeff")
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(ct_spec, ct_spec, hint_spec, hint_spec,
                  _tab_specs(tb), _tab_specs(te), const_specs),
        out_specs=ct_spec,
    )

    @jax.jit
    def run(ct_a, ct_b, hb, ha):
        return sharded(ct_a, ct_b, hb, ha, tb, te, consts)

    return run


def make_dist_rescale(cfg: DistConfig, mesh: Mesh, active: int,
                      strategy: str | None = None):
    """Mesh-sharded exact BGV rescale dropping limb `active-1` of the PADDED
    chain (she/fast.rescale semantics, one limb; reference: SymmSHE modSwitch,
    /root/reference Crypto/Alchemy/Interpreter/Eval.hs:123).

    The ciphertext stays at the full allocation [B, 2, L0, n] with rows
    ≥ active zeroed (the production deep-chain layout: the limb sharding is
    fixed across levels, the active prefix shrinks). Returns the same shape
    with row active-1 dropped (zeroed) and rows < active-1 exactly rescaled.
    Cross-chip traffic: ONE psum broadcasting the dropped limb's coefficient
    row over 'limb' (SURVEY.md §2.4 TP row — cross-limb mixing only in
    modSwitch/key-switch) plus the NTT all_to_alls over 'coeff'."""
    strategy = strategy or pick_dist_strategy(mesh)
    C = mesh.shape["coeff"]
    p = cfg.p
    qs = p.qs
    L0 = len(qs)
    assert 2 <= active <= L0
    qk = qs[active - 1]
    pz = p.zp
    assert pz & (pz - 1) == 0, "power-of-two plaintext modulus"
    t = dist_tables(cfg)

    keep = np.zeros((L0, 1), dtype=np.uint32)
    qk_mod = np.zeros((L0, 1), dtype=np.uint32)
    qk_mod_s = np.zeros((L0, 1), dtype=np.uint32)
    inv_qk = np.ones((L0, 1), dtype=np.uint32)
    inv_qk_s = np.zeros((L0, 1), dtype=np.uint32)
    for j, qj in enumerate(qs):
        if j >= active - 1:
            continue
        keep[j] = 1
        qk_mod[j] = qk % qj
        qk_mod_s[j] = shoup_const(qk % qj, qj)
        iv = pow(qk, -1, qj)
        inv_qk[j] = iv
        inv_qk_s[j] = shoup_const(iv, qj)
    consts = {"keep": keep, "qk_mod": qk_mod, "qk_mod_s": qk_mod_s,
              "inv_qk": inv_qk, "inv_qk_s": inv_qk_s}
    const_specs = {k: P("limb", None) for k in consts}
    half = np.uint32(qk // 2)
    maskp = np.uint32(pz - 1)
    qk_mod_p = np.uint32(qk % pz)
    inv_qk_p = np.uint32(pow(qk, -1, pz))
    pz32 = np.uint32(pz)

    def step(ct, tabs, cs):
        q = tabs["q"]
        coeff = _dist_intt_local(ct, tabs, cfg, strategy, C)  # [B, 2, L_loc, n_loc]
        L_loc = coeff.shape[-2]
        li = jax.lax.axis_index("limb")
        gidx = li * L_loc + jnp.arange(L_loc, dtype=jnp.int32)
        sel = (gidx == active - 1).astype(jnp.uint32)[:, None]
        r = jax.lax.psum(jnp.sum(coeff * sel, axis=-2), "limb")  # [B, 2, n_loc]
        is_neg = r > half
        r_mod_p = r & maskp
        rc_mod_p = jnp.where(
            is_neg, (r_mod_p + pz32 - (qk_mod_p & maskp)) & maskp, r_mod_p)
        tt = (((pz32 - rc_mod_p) & maskp) * inv_qk_p) & maskp
        t_neg = tt > pz // 2
        rb = r[..., None, :]
        r_red = _reduce_u32_local(rb, q, tabs["r16"], tabs["r16s"])
        rc = jnp.where(
            is_neg[..., None, :],
            jnp.where(r_red >= cs["qk_mod"], r_red - cs["qk_mod"],
                      r_red + q - cs["qk_mod"]),
            r_red)
        ttb = tt[..., None, :]
        tc = jnp.where(t_neg[..., None, :], q - (pz32 - ttb), ttb)
        qkt = mulmod_shoup(tc, cs["qk_mod"], cs["qk_mod_s"], q)
        delta = _cond_sub(rc + qkt, q)
        diff = jnp.where(coeff >= delta, coeff - delta, coeff + q - delta)
        out = mulmod_shoup(diff, cs["inv_qk"], cs["inv_qk_s"], q)
        out = out * cs["keep"]
        return _dist_ntt_local(out, tabs, cfg, strategy, C)

    ct_spec = P("batch", None, "limb", "coeff")
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(ct_spec, _tab_specs(t), const_specs),
        out_specs=ct_spec,
    )

    @jax.jit
    def run(ct):
        return sharded(ct, t, consts)

    return run


def make_dist_ntt(cfg: DistConfig, mesh: Mesh, strategy: str | None = None):
    """Sharded forward/inverse negacyclic NTT on [B, L, n] (testing/bench).

    `strategy` picks the DistNTT transpose: 'a2a' (one tiled all_to_all) or
    'ring' (C-1 staged ppermute rounds); default by slice topology."""
    strategy = strategy or pick_dist_strategy(mesh)
    C = mesh.shape["coeff"]
    t = dist_tables(cfg)
    tab_specs = _tab_specs(t)
    spec = P("batch", "limb", "coeff")

    fwd = jax.shard_map(
        lambda x, tabs: _dist_ntt_local(x, tabs, cfg, strategy, C),
        mesh=mesh, in_specs=(spec, tab_specs), out_specs=spec,
    )
    inv = jax.shard_map(
        lambda x, tabs: _dist_intt_local(x, tabs, cfg, strategy, C),
        mesh=mesh, in_specs=(spec, tab_specs), out_specs=spec,
    )
    return jax.jit(lambda x: fwd(x, t)), jax.jit(lambda x: inv(x, t))
