"""Whole-program XLA compilation of compiled ciphertext expressions.

The reference dispatches each `Cyc` op across the Haskell↔C++ FFI boundary
(SURVEY.md §3.1); the rebuild's eager mode similarly dispatches per op from
Python. `jit_compile` removes that boundary entirely: it traces the compiled
IR's evaluation — every modSwitch, keySwitchQuad, tunnel and ring transform —
into ONE jitted XLA program over the raw ciphertext arrays. Ciphertext
metadata (rings, chains, scales, bases) is static Python state resolved at
trace time; hints/keys/plaintext payloads embed as constants.

Requires the XLA backend (golden is numpy). The error-rate-logging mode
(interp/error_writer.py) stays eager: the probe needs host CRT lifts.
"""

from __future__ import annotations

import jax

from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.interp.eval import eval_ir
from alchemy_tpu.interp.pt2ct import CompiledExpr
from alchemy_tpu.she.ct import CT


class JitCompiled:
    def __init__(self, compiled: CompiledExpr, example_cts: list[CT]):
        self.compiled = compiled
        # static metadata template per argument
        self.arg_meta = [
            (ct.m, ct.zp, ct.scale, [(c.m, c.qs, c.basis) for c in ct.comps])
            for ct in example_cts
        ]
        self.bk = example_cts[0].bk
        out_box = {}

        def raw(flat):
            cts = []
            i = 0
            for (m, zp, scale, comps_meta) in self.arg_meta:
                comps = []
                for (cm, qs, basis) in comps_meta:
                    comps.append(Cyc(_ring(cm), qs, basis, flat[i], self.bk))
                    i += 1
                cts.append(CT(m=m, zp=zp, scale=scale, comps=tuple(comps)))
            out = eval_ir(self.compiled.ir, *cts)
            out_box["meta"] = (
                out.m, out.zp, out.scale,
                [(c.m, c.qs, c.basis) for c in out.comps],
            )
            return tuple(c.data for c in out.comps)

        self._jitted = jax.jit(raw)
        # trace eagerly once to capture output metadata
        self._jitted.lower([c.data for ct in example_cts for c in ct.comps])
        self.out_meta = out_box["meta"]

    def __call__(self, *cts: CT) -> CT:
        flat = [c.data for ct in cts for c in ct.comps]
        arrays = self._jitted(flat)
        (m, zp, scale, comps_meta) = self.out_meta
        comps = tuple(
            Cyc(_ring(cm), qs, basis, arr, self.bk)
            for (cm, qs, basis), arr in zip(comps_meta, arrays)
        )
        return CT(m=m, zp=zp, scale=scale, comps=comps)


def _ring(m: int):
    from alchemy_tpu.core.ring import get_ring

    return get_ring(m)


def jit_compile(compiled: CompiledExpr, example_cts: list[CT]) -> JitCompiled:
    """Compile the full ciphertext program into one XLA executable.
    `example_cts` fix the (static) argument metadata."""
    return JitCompiled(compiled, example_cts)
