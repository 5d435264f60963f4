#!/usr/bin/env python
"""ERW observability at example scale (VERDICT r4 #9): ONE recorded device
run of the Tunnel example with the jitted device-resident noise probe at
full tower size — the reference's ErrorRateWriter mode
(ErrorRateWriter.hs:85-106; examples/Tunnel.hs:72-76) on its actual
workload, with per-op error rates riding along as jit outputs (zero host
lifts; interp/jit_exec.py noise_probe mode).

Writes ERW_r05.json at the repo root. Env: ERW_ONLY=tunnel|homomrlwr
(default tunnel — the smaller build).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/alchemy_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from alchemy_tpu.backend import xla_backend
    from alchemy_tpu.core.cyc import Cyc
    from alchemy_tpu.interp.eval import eval_ir
    from alchemy_tpu.interp.jit_exec import jit_compile
    from alchemy_tpu.interp.keys_hints import KeysHints
    from alchemy_tpu.interp.pt2ct import pt2ct
    from alchemy_tpu.nt.factor import totient

    which = os.environ.get("ERW_ONLY", "tunnel")
    bk = xla_backend()
    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    if which == "tunnel":
        from alchemy_tpu.examples.common import H0, M_MAP, switch
        from alchemy_tpu.examples.tunnel import PT, ZP, ZQS
        from alchemy_tpu.she.gadget import BaseBGad

        expr = switch(3, ZP, "xla")
        ctx = KeysHints(3.0, seed=1, bk=bk)
        compiled = pt2ct(expr, res_ty=PT, m_map=M_MAP, zqs=ZQS,
                         gad=BaseBGad(2), ctx=ctx)
        x = Cyc.from_coeffs(H0, (ZP,), rng.integers(0, ZP, totient(H0)), bk)
        ct = compiled.encrypt_arg(x, 0)
        want = eval_ir(expr, x)
    else:
        from alchemy_tpu.examples.common import H0, M_MAP
        from alchemy_tpu.examples.homomrlwr import PT, ZP_IN, ZQS, ring_round
        from alchemy_tpu.she import bgv
        from alchemy_tpu.she.gadget import TrivGad

        expr = ring_round("xla")
        ctx = KeysHints(5.0, seed=0, bk=bk)
        compiled = pt2ct(expr, res_ty=PT, m_map=M_MAP, zqs=ZQS,
                         gad=TrivGad(), ctx=ctx)
        s = Cyc.from_coeffs(H0, (ZP_IN,),
                            rng.integers(0, ZP_IN, totient(H0)), bk)
        a = Cyc.from_coeffs(H0, (ZP_IN,),
                            rng.integers(0, ZP_IN, totient(H0)), bk)
        enc_s = compiled.encrypt_arg(s, 0)
        ct = bgv.mul_public(a, enc_s)
        want = eval_ir(expr, s * a)
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    jfn = jit_compile(compiled, [ct], noise_probe=ctx)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out, rates = jfn(ct)
    for c in out.comps:
        c.data.block_until_ready()
    first_s = time.perf_counter() - t0
    # warm steady-state timing with the probe attached
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out, rates = jfn(ct)
    for c in out.comps:
        c.data.block_until_ready()
    per_ms = (time.perf_counter() - t0) / iters * 1e3

    ok = compiled.decrypt(out).equals(want)
    rec = {
        "workload": which,
        "device": str(jax.devices()[0]),
        "decrypt_pass": bool(ok),
        "keygen_compile_s": round(build_s, 1),
        "probe_build_lower_s": round(compile_s, 1),
        "first_call_s": round(first_s, 1),
        "ms_per_run_with_probe": round(per_ms, 2),
        "per_op_error_rates": [
            {"op": lbl, "rate": float(r)} for lbl, r in rates
        ],
        "note": ("per-op rates are auxiliary outputs of the ONE jitted XLA "
                 "program (device-resident Garner-digit probe, "
                 "she/noise_probe.py) — the reference's ErrorRateWriter "
                 "log, under whole-program jit at full tower size"),
    }
    path = os.path.join(_ROOT, "ERW_r05.json")
    # merge: the artifact holds one record per workload
    merged = {}
    if os.path.exists(path):
        prev = json.load(open(path))
        merged = prev if "workloads" in prev else {
            "workloads": {prev.get("workload", "tunnel"): prev}}
    merged.setdefault("workloads", {})[which] = rec
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(rec, indent=1))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
