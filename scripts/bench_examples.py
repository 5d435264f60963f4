#!/usr/bin/env python
"""Device wall-clock for the reference example workloads as WHOLE XLA
programs (interp/jit_exec.py): Tunnel (3 ring-tunnels, BaseBGad 2) and
HomomRLWR (5 tunnels + depth-5 rescale tree, TrivGad) — the reference's own
phase split (keygen+compile vs encrypted eval, examples/Common.hs:99-127).

Knobs: EX_SECONDS (measure window), EX_ONLY (tunnel|homomrlwr).
Measured numbers land in BASELINE.md."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/alchemy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alchemy_tpu.backend import xla_backend
from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.interp.eval import eval_ir
from alchemy_tpu.interp.jit_exec import jit_compile
from alchemy_tpu.interp.keys_hints import KeysHints
from alchemy_tpu.interp.pt2ct import pt2ct
from alchemy_tpu.nt.factor import totient


def _sync_ct(ct):
    for c in ct.comps:
        c.data.block_until_ready()
    return np.asarray(ct.comps[0].data[..., :1])


def measure(jfn, args, min_seconds):
    out = jfn(*args)
    _sync_ct(out)
    iters = 2
    while True:
        t0 = time.perf_counter()
        o = out
        for _ in range(iters):
            o = jfn(*args)
        _sync_ct(o)
        dt = time.perf_counter() - t0
        if dt >= min_seconds:
            return dt / iters, o
        iters *= 2


def run_tunnel(secs):
    from alchemy_tpu.examples.common import H0, M_MAP, switch
    from alchemy_tpu.examples.tunnel import PT, ZP, ZQS
    from alchemy_tpu.she.gadget import BaseBGad

    bk = xla_backend()
    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    expr = switch(3, ZP, "xla")
    ctx = KeysHints(3.0, seed=1, bk=bk)
    compiled = pt2ct(expr, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=BaseBGad(2),
                     ctx=ctx)
    x = Cyc.from_coeffs(H0, (ZP,), rng.integers(0, ZP, totient(H0)), bk)
    ct = compiled.encrypt_arg(x, 0)
    print(f"tunnel: keygen+compile {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    jfn = jit_compile(compiled, [ct])
    print(f"tunnel: jit_exec build+lower {time.perf_counter()-t0:.2f}s",
          flush=True)
    per, out = measure(jfn, [ct], secs)
    ok = compiled.decrypt(out).equals(eval_ir(expr, x))
    print(f"tunnel: {per*1e3:.2f} ms/run on {jax.devices()[0].platform} "
          f"({'PASS' if ok else 'FAIL'})", flush=True)
    return per, ok


def run_homomrlwr(secs):
    from alchemy_tpu.examples.common import H0, M_MAP
    from alchemy_tpu.examples.homomrlwr import PT, ZP_IN, ZQS, ring_round
    from alchemy_tpu.she import bgv
    from alchemy_tpu.she.gadget import TrivGad

    bk = xla_backend()
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    expr = ring_round("xla")
    ctx = KeysHints(5.0, seed=0, bk=bk)
    compiled = pt2ct(expr, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=TrivGad(),
                     ctx=ctx)
    s = Cyc.from_coeffs(H0, (ZP_IN,), rng.integers(0, ZP_IN, totient(H0)), bk)
    a = Cyc.from_coeffs(H0, (ZP_IN,), rng.integers(0, ZP_IN, totient(H0)), bk)
    enc_s = compiled.encrypt_arg(s, 0)
    ct_sa = bgv.mul_public(a, enc_s)
    print(f"homomrlwr: keygen+compile {time.perf_counter()-t0:.2f}s",
          flush=True)
    t0 = time.perf_counter()
    jfn = jit_compile(compiled, [ct_sa])
    print(f"homomrlwr: jit_exec build+lower {time.perf_counter()-t0:.2f}s",
          flush=True)
    per, out = measure(jfn, [ct_sa], secs)
    want = eval_ir(expr, s * a)
    dec = compiled.decrypt(out)
    ok = dec is not None and dec.equals(want)
    print(f"homomrlwr: {per*1e3:.2f} ms/run on {jax.devices()[0].platform} "
          f"({'PASS' if ok else 'FAIL'})", flush=True)
    return per, ok


if __name__ == "__main__":
    secs = float(os.environ.get("EX_SECONDS", "2.0"))
    only = os.environ.get("EX_ONLY", "")
    ok = True
    if only in ("", "tunnel"):
        ok &= run_tunnel(secs)[1]
    if only in ("", "homomrlwr"):
        ok &= run_homomrlwr(secs)[1]
    sys.exit(0 if ok else 1)
