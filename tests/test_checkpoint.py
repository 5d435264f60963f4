"""Checkpoint/resume of keys + hints + compiled schedule (SURVEY.md §5;
reference KeysHints.hs:47-53 — keys/hints are the long-lived state carried
out of compilation, HomomRLWR.hs:55-70)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from alchemy_tpu.backend import golden_backend
from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.core.params import RnsChain
from alchemy_tpu.interp.eval import eval_ir
from alchemy_tpu.interp.keys_hints import KeysHints
from alchemy_tpu.interp.noise import PtTy
from alchemy_tpu.interp.pt2ct import pt2ct
from alchemy_tpu.lang import dsl
from alchemy_tpu.lang.ir import App
from alchemy_tpu.nt.factor import totient
from alchemy_tpu.nt.primes import find_ntt_prime
from alchemy_tpu.she.gadget import BaseBGad, HybridGad, TrivGad
from alchemy_tpu.she.linear import LinearMap
from alchemy_tpu.she.serialize import load_checkpoint, save_checkpoint

BK = golden_backend()


def _compile_addmul(gad, seed=7):
    from alchemy_tpu.examples.arithmetic import M, M_MAP, PT, ZP, ZQS, addMul

    rng = np.random.default_rng(seed)
    ctx = KeysHints(3.0, seed=seed, bk=BK)
    compiled = pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=gad, ctx=ctx)
    pt1 = Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), BK)
    pt2 = Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), BK)
    want = eval_ir(addMul, pt1, pt2)
    a1 = compiled.encrypt_arg(pt1, 0)
    a2 = compiled.encrypt_arg(pt2, 1)
    result = eval_ir(compiled.ir, a1, a2)
    return compiled, a1, a2, result, want


@pytest.mark.parametrize("gad", [TrivGad(), HybridGad(dnum=2)])
def test_checkpoint_roundtrip_quad_hints(tmp_path, gad):
    compiled, a1, a2, result, want = _compile_addmul(gad)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(compiled, path, cts={"result": result, "a1": a1, "a2": a2})

    loaded, cts = load_checkpoint(path)
    # 1. in-flight ciphertext decrypts in the resumed context
    dec = loaded.decrypt(cts["result"])
    assert dec is not None and dec.equals(want)
    # 2. the compiled schedule re-executes (hints embedded in the IR work)
    res2 = eval_ir(loaded.ir, cts["a1"], cts["a2"])
    dec2 = loaded.decrypt(res2)
    assert dec2 is not None and dec2.equals(want)
    # 3. the encryption boundary works for fresh arguments
    rng = np.random.default_rng(99)
    from alchemy_tpu.examples.arithmetic import M, ZP, addMul

    p1 = Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), BK)
    p2 = Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), BK)
    out = eval_ir(loaded.ir, loaded.encrypt_arg(p1, 0), loaded.encrypt_arg(p2, 1))
    assert loaded.decrypt(out).equals(eval_ir(addMul, p1, p2))
    # memoized hint cache survives (same cache keys, same gadget)
    assert set(loaded.ctx.hints) == set(compiled.ctx.hints)


def test_checkpoint_roundtrip_tunnel_hint(tmp_path):
    # one linearCyc hop r=8 → s=4 over e=4 at m'=24 (test_bgv.test_tunnel_small
    # geometry) compiled through pt2ct so the IR carries a TunnelHint payload
    r, s, e = 8, 4, 4
    p = 8
    rng = np.random.default_rng(5)
    zqs = RnsChain([find_ntt_prime(24, b) for b in (30, 29, 28)])
    dim = totient(r) // totient(e)
    images = tuple(
        Cyc.from_coeffs(s, (p,), rng.integers(0, p, size=totient(s)), BK)
        for _ in range(dim)
    )
    f = LinearMap(e=e, r=r, s=s, images=images)
    expr = dsl.lam(lambda x: App(dsl.linear_cyc(f), x))
    ctx = KeysHints(1.0, seed=5, bk=BK)
    compiled = pt2ct(expr, res_ty=PtTy(pnoise=0, m=s, zp=p),
                     m_map={r: 24, s: 24}, zqs=zqs, gad=BaseBGad(2), ctx=ctx)
    x = Cyc.from_coeffs(r, (p,), rng.integers(0, p, size=totient(r)), BK)
    want = eval_ir(expr, x)
    ct = compiled.encrypt_arg(x, 0)
    result = eval_ir(compiled.ir, ct)

    path = str(tmp_path / "tunnel_ckpt.npz")
    save_checkpoint(compiled, path, cts={"arg": ct, "result": result})
    loaded, cts = load_checkpoint(path)
    assert loaded.decrypt(cts["result"]).equals(want)
    res2 = eval_ir(loaded.ir, cts["arg"])
    assert loaded.decrypt(res2).equals(want)


def test_checkpoint_fresh_process(tmp_path):
    """SURVEY §5: compile → save → FRESH PROCESS → decrypt."""
    compiled, a1, a2, result, want = _compile_addmul(TrivGad())
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(compiled, path, cts={"result": result, "a1": a1, "a2": a2})

    script = (
        "import sys, numpy as np\n"
        "from alchemy_tpu.she.serialize import load_checkpoint\n"
        "from alchemy_tpu.interp.eval import eval_ir\n"
        f"loaded, cts = load_checkpoint({path!r})\n"
        "dec = loaded.decrypt(cts['result'])\n"
        "res2 = eval_ir(loaded.ir, cts['a1'], cts['a2'])\n"
        "dec2 = loaded.decrypt(res2)\n"
        "assert dec2.equals(dec)\n"
        "print('COEFFS', loaded.ctx.bk.to_numpy(dec.data)[0].tolist())\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("COEFFS")][0]
    got = eval(line.split(" ", 1)[1])
    assert got == BK.to_numpy(want.data)[0].tolist()


def test_resumed_contexts_never_reuse_encryption_randomness(tmp_path):
    """Two processes resuming from the SAME checkpoint must not replay the
    same (a, e) encryption randomness (ciphertext differences would cancel
    the a·s mask): every load reseeds from OS entropy."""
    from alchemy_tpu.core.cyc import Cyc
    from alchemy_tpu.interp.keys_hints import KeysHints
    from alchemy_tpu.interp.pt2ct import pt2ct
    from alchemy_tpu.lang.dsl import lam2
    from alchemy_tpu.nt.factor import totient
    from alchemy_tpu.she.gadget import TrivGad
    from alchemy_tpu.she.serialize import load_checkpoint, save_checkpoint
    from alchemy_tpu.examples.arithmetic import M, M_MAP, PT, ZP, ZQS, addMul

    ctx = KeysHints(3.0, seed=0)
    compiled = pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=TrivGad(),
                     ctx=ctx)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(compiled, path)
    worker1, _ = load_checkpoint(path)
    worker2, _ = load_checkpoint(path)
    pt = Cyc.from_coeffs(M, (ZP,), np.zeros(totient(M), dtype=np.int64),
                         worker1.ctx.bk)
    c1 = worker1.encrypt_arg(pt, 0)
    c2 = worker2.encrypt_arg(pt, 0)
    # the uniform mask component a must differ between the two resumes
    assert not np.array_equal(np.asarray(c1.comps[1].data),
                              np.asarray(c2.comps[1].data))


def test_deep_circuit_kill_and_resume(tmp_path):
    """SURVEY §5 failure/recovery exercised AS recovery (VERDICT r4 missing
    #5): the deep mul+relin+rescale chain checkpoints mid-chain, the
    process is killed (SIGKILL after the save — an abrupt death, not a
    clean exit), and a FRESH process resumes from the state file, completes
    the remaining levels, and the decrypt oracle passes for the full
    chain."""
    state = str(tmp_path / "deep_state.npz")
    phase1 = (
        "import os\n"
        "from alchemy_tpu.examples.deep_circuit import run\n"
        f"out = run(log_n=7, depth=6, impl='vpu', verbose=False,"
        f" stop_at_level=3, state_path={state!r})\n"
        "assert out == (None, 3), out\n"
        "os.kill(os.getpid(), 9)\n"   # die abruptly after the checkpoint
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cwd = os.path.dirname(os.path.dirname(__file__))
    out1 = subprocess.run([sys.executable, "-c", phase1], capture_output=True,
                          text=True, env=env, cwd=cwd)
    assert out1.returncode == -9, (out1.returncode, out1.stderr)
    assert os.path.exists(state)

    phase2 = (
        "from alchemy_tpu.examples.deep_circuit import run\n"
        f"ok, depth = run(resume=True, state_path={state!r}, verbose=False)\n"
        "assert ok and depth == 6, (ok, depth)\n"
        "print('RESUME_PASS')\n"
    )
    out2 = subprocess.run([sys.executable, "-c", phase2], capture_output=True,
                          text=True, env=env, cwd=cwd)
    assert out2.returncode == 0, out2.stderr
    assert "RESUME_PASS" in out2.stdout
