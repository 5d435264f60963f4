"""Language layer: DSL construction, interpreters, inference, PT2CT rules."""

import numpy as np
import pytest

from alchemy_tpu.backend import golden_backend
from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.core.params import RnsChain
from alchemy_tpu.interp import dup, pprint, size
from alchemy_tpu.interp.eval import eval_ir
from alchemy_tpu.interp.infer import Inference
from alchemy_tpu.interp.noise import FunTy, NoiseLedger, PtTy
from alchemy_tpu.interp.params_print import params
from alchemy_tpu.lang.dsl import add_lit_n, div2, lam, lam2, let_
from alchemy_tpu.nt.factor import totient

BK = golden_backend()

addMul = lam2(lambda x, y: (x + y) * y)


def test_pprint_matches_reference_format():
    assert pprint(addMul) == "(\\v0 -> (\\v1 -> ((mul ((add v0) v1)) v1)))"


def test_size():
    # lam=+1 each (2), mul+add prims (2), three vars (3)
    assert size(addMul) == 7


def test_dup_shares():
    a, b = dup(addMul)
    assert a is b


def test_eval_plaintext():
    p = 7
    a = Cyc.from_coeffs(4, (p,), [1, 2], BK)
    b = Cyc.from_coeffs(4, (p,), [3, 4], BK)
    got = eval_ir(addMul, a, b)
    want = (a + b) * b
    assert got.equals(want)


def test_let_sharing():
    p = 7
    e = lam(lambda x: let_(x + x, lambda y: y * y))
    a = Cyc.from_coeffs(4, (p,), [1, 2], BK)
    got = eval_ir(e, a)
    want = (a + a) * (a + a)
    assert got.equals(want)


def test_inference_addmul():
    # Arithmetic chain: units 4,3,4
    zqs = RnsChain([268440577, 8392193, 1073750017])
    inf = Inference(NoiseLedger(zqs))
    inf.run(addMul, PtTy(0, 4, 7))
    t = inf.tref(addMul).ty
    assert isinstance(t, FunTy)
    arg = inf.resolved_pt(t.arg)
    # mul out p=0 → needs 0+3 muls → units 5 → prefix 2 limbs (7 units) → pin 5
    assert arg == PtTy(5, 4, 7)


def test_inference_div2_changes_zp():
    zqs = RnsChain([268440577, 8392193, 1073750017])
    e = lam(lambda x: div2(x))
    inf = Inference(NoiseLedger(zqs))
    inf.run(e, PtTy(0, 4, 8))
    arg = inf.resolved_pt(inf.tref(e).ty.arg)
    assert arg == PtTy(0, 4, 16)


def test_noise_ledger_constants():
    from alchemy_tpu.interp import noise

    assert noise.MIN_UNITS == 2
    assert noise.MUL_PNOISE == 3
    assert noise.KS_ACCUM_PNOISE == 2
    assert noise.MAX_32BIT_UNITS == 5
    assert noise.TUNNEL_PNOISE == 1


def test_ledger_insufficient_moduli_error():
    zqs = RnsChain([268440577])
    led = NoiseLedger(zqs)
    with pytest.raises(ValueError, match="more/bigger moduli"):
        led.prefix_len(20)


def test_pt_params_output():
    zqs = RnsChain([268440577, 8392193, 1073750017])
    out = params(addMul, res_ty=PtTy(0, 4, 7), zqs=zqs)
    assert out.splitlines() == ["mul 0", "add 5"]


def test_arithmetic_example_passes():
    from alchemy_tpu.examples.arithmetic import run

    assert run(seed=1, verbose=False)
    assert run(seed=2, verbose=False)


def test_serialize_keys_roundtrip(tmp_path):
    from alchemy_tpu.interp.keys_hints import KeysHints
    from alchemy_tpu.she.serialize import load_keys, save_keys

    ctx = KeysHints(3.0, seed=5)
    sk = ctx.get_key(32)
    path = str(tmp_path / "keys.npz")
    save_keys(ctx, path)
    ctx2 = load_keys(path)
    assert ctx2.r == 3.0
    assert np.array_equal(ctx2.keys[32].coeffs, sk.coeffs)
    assert ctx2.keys[32].variance == sk.variance


def test_object_language_monads():
    from alchemy_tpu.lang import dsl
    from alchemy_tpu.lang.ir import App

    # writer: tell then bind
    prog = App(
        App(dsl.bind_("writer"), App(dsl.tell_(), App(App(dsl.cons_(), dsl.string_("log")), dsl.nil_()))),
        lam(lambda _x: App(dsl.pure_("writer"), dsl.string_("done"))),
    )
    val, log = eval_ir(prog)
    assert val == "done" and log == ["log"]
    # reader: ask
    prog2 = App(App(dsl.bind_("reader"), dsl.ask_()), lam(lambda x: App(dsl.pure_("reader"), x)))
    assert eval_ir(prog2)(42) == 42


def test_all_main():
    from alchemy_tpu.examples.all_main import main

    assert main()


def test_error_rate_prim():
    # the object-language errorRate_ op (Language/SHE.hs:49-56)
    from alchemy_tpu.interp.keys_hints import KeysHints
    from alchemy_tpu.interp.pt2ct import pt2ct
    from alchemy_tpu.lang import dsl
    from alchemy_tpu.lang.ir import App
    from alchemy_tpu.she.gadget import TrivGad
    from alchemy_tpu.examples.arithmetic import M, M_MAP, PT, ZP, ZQS, addMul

    ctx = KeysHints(3.0, seed=3)
    compiled = pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=TrivGad(), ctx=ctx)
    rng = np.random.default_rng(3)
    from alchemy_tpu.nt.factor import totient

    pt1 = Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), ctx.bk)
    ct = compiled.encrypt_arg(pt1, 0)
    sk = ctx.get_key(M_MAP[M])
    rate = eval_ir(dsl.error_rate_(sk))(ct)
    assert 0 < rate < 1e-4


def test_params_on_rescale_tree_program():
    # inference over the full HomomRLWR plaintext program
    from alchemy_tpu.examples.homomrlwr import PT, ZQS, ring_round

    expr = ring_round()
    out = params(expr, res_ty=PT, zqs=ZQS)
    lines = out.splitlines()
    assert sum(1 for l in lines if l.startswith("linear")) == 5
    assert sum(1 for l in lines if l.startswith("mul")) == 8  # 1 (y=x(1+x)) + 7 tree
    assert sum(1 for l in lines if l.startswith("div2")) == 15
    # the five tunnels run at pnoise 15..19 (one TunnelPNoise unit per hop)
    linear_ps = [int(l.split()[1]) for l in lines if l.startswith("linear")]
    assert linear_ps == [15, 16, 17, 18, 19]


def test_compiled_arithmetic_print_shape():
    # guard the compiled-IR structure (PT2CT.hs:177's op order)
    from alchemy_tpu.interp.keys_hints import KeysHints
    from alchemy_tpu.interp.pt2ct import pt2ct
    from alchemy_tpu.she.gadget import TrivGad
    from alchemy_tpu.examples.arithmetic import M_MAP, PT, ZQS, addMul

    ctx = KeysHints(3.0, seed=0)
    compiled = pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=TrivGad(), ctx=ctx)
    assert pprint(compiled.ir) == (
        "(\\v0 -> (\\v1 -> (((\\v2 -> (\\v3 -> (modSwitch (keySwitchQuad <HINT> "
        "(modSwitch ((mul v2) v3)))))) ((add v0) v1)) v1)))"
    )


def test_pt2ct_lookup_error():
    from alchemy_tpu.interp.keys_hints import KeysHints
    from alchemy_tpu.interp.pt2ct import pt2ct
    from alchemy_tpu.she.gadget import TrivGad
    from alchemy_tpu.examples.arithmetic import PT, ZQS, addMul

    with pytest.raises(ValueError, match="divide"):
        pt2ct(addMul, res_ty=PT, m_map={4: 511}, zqs=ZQS, gad=TrivGad(),
              ctx=KeysHints(3.0))


def test_pt2ct_non_ntt_modulus_error():
    from alchemy_tpu.interp.keys_hints import KeysHints
    from alchemy_tpu.interp.pt2ct import pt2ct
    from alchemy_tpu.she.gadget import TrivGad
    from alchemy_tpu.examples.arithmetic import M_MAP, PT, addMul

    bad = RnsChain([1000003, 1000033])  # primes but ≢ 1 mod 512
    with pytest.raises(ValueError, match="NTT-friendly"):
        pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=bad, gad=TrivGad(),
              ctx=KeysHints(3.0))


def test_local_batch_slice():
    from alchemy_tpu.parallel.multihost import local_batch_slice

    s = local_batch_slice(16)
    assert s == slice(0, 16)  # single process


def test_monad_accumulator_surface():
    """MonadAccumulator reification (interp/accumulator.py): append /
    accumulate / readerToAccumulator semantics and runners
    (MonadAccumulator.hs:19-26, :68-82), plus the append-only law on the
    typed store the KeysHints context is built on."""
    import pytest as _pytest

    from alchemy_tpu.interp.accumulator import (
        Accumulator,
        DictAccumulator,
        eval_accumulator,
        run_accumulator,
    )

    # list monoid
    acc = Accumulator([], lambda a, b: a + (b or []))
    acc.append([1])
    got = acc.accumulate(lambda w: (sum(w), [2]))
    assert got == 1 and acc.value == [1, 2]
    assert acc.reader(lambda w: len(w)) == 2
    assert acc.value == [1, 2]  # reader appends nothing

    res, state = run_accumulator(
        lambda a: (a.append([7]), a.value[-1])[1], [], lambda x, y: x + (y or []))
    assert res == 7 and state == [7]
    assert eval_accumulator(lambda a: 42, [], lambda x, y: x) == 42

    d = DictAccumulator()
    d["k"] = 1
    d.append({"j": 2})
    assert dict(d.items()) == {"k": 1, "j": 2} and d.get("x") is None
    with _pytest.raises(ValueError):
        d["k"] = 99  # append-only: rebinding raises


def test_keys_hints_append_only():
    """The KeysHints stores enforce the accumulator discipline: memoized
    keys/hints are never silently rebound (KeysHints.hs:89-96 gen-if-missing
    semantics)."""
    from alchemy_tpu.interp.keys_hints import KeysHints

    ctx = KeysHints(1.0, seed=3)
    sk = ctx.get_key(16)
    assert ctx.get_key(16) is sk          # memoized, no regeneration
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ctx.keys[16] = "other"
