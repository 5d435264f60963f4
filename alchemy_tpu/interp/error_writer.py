"""ERW — error-rate instrumentation (reference Interpreter/ErrorRateWriter.hs).

The reference rewrites the object program into a Kleisli program over an
object-language writer monad, logging `(opName ++ modulus, errorRate)` after
every ciphertext-producing op (ErrorRateWriter.hs:70-75, 85-106). The
TPU-native equivalent (SURVEY.md §3.5) is an instrumented evaluation mode:
same IR, same log format `[(str, float)]`, with the secret keys looked up
from the KeysHints context (debug/observability mode — requires keys)."""

from __future__ import annotations

from alchemy_tpu.interp.eval import _prim_value  # reuse the evaluator core
from alchemy_tpu.interp.keys_hints import KeysHints
from alchemy_tpu.lang.ir import App, Lam, Node, Prim, Var
from alchemy_tpu.she import bgv
from alchemy_tpu.she.ct import CT

#: ops that produce ciphertexts and are probed (ErrorRateWriter.hs:108-198)
_PROBED = {
    "add_", "neg_", "mul_", "addLit_", "mulLit_", "div2_",
    "modSwitchPT_", "modSwitch_", "addPublic_", "mulPublic_",
    "keySwitchQuad_", "tunnel_",
}


def _zq_str(qs) -> str:
    return "Zq[" + ",".join(str(q) for q in qs) + "]"


#: error rate above which decryption failure is imminent (reference
#: observation, SURVEY.md §4 item 4: rates approaching ~0.25-0.5 fail)
NOISE_OVERFLOW_THRESHOLD = 0.25


class NoiseOverflowError(RuntimeError):
    """Raised in strict mode when a ciphertext's error rate crosses the
    decryption-failure threshold (the runtime analog of the reference's
    compile-time modulus-exhaustion TypeError)."""


class _Probe:
    def __init__(self, ctx: KeysHints, log: list, strict: bool = False):
        self.ctx = ctx
        self.log = log
        self.strict = strict

    def wrap(self, name: str, v):
        if callable(v):
            return lambda x: self.wrap(name, v(x))
        if isinstance(v, CT):
            sk = self.ctx.lookup_key(v.m_prime)
            if sk is not None:
                rate = bgv.error_rate(sk, v)
                self.log.append((f"{name}{_zq_str(v.qs)}", rate))
                if self.strict and rate > NOISE_OVERFLOW_THRESHOLD:
                    raise NoiseOverflowError(
                        f"{name} at {_zq_str(v.qs)}: error rate {rate:.3g} "
                        f"exceeds {NOISE_OVERFLOW_THRESHOLD}"
                    )
        return v


def eval_with_error_rates(expr: Node, ctx: KeysHints, *args, strict: bool = False):
    """Evaluate a (compiled) expression, returning (result, error_rate_log).
    The log is the reference's ErrorRateLog: [(op ++ modulus, rate)].
    strict=True raises NoiseOverflowError when a rate crosses the
    decryption-failure threshold."""
    log: list[tuple[str, float]] = []
    probe = _Probe(ctx, log, strict)

    def ev(node: Node, env: tuple):
        if isinstance(node, Var):
            return env[node.idx]
        if isinstance(node, Lam):
            return lambda v: ev(node.body, (v,) + env)
        if isinstance(node, App):
            return ev(node.f, env)(ev(node.a, env))
        if isinstance(node, Prim):
            v = _prim_value(node.name, node.payload)
            if node.name in _PROBED:
                return probe.wrap(node.name, v)
            return v
        raise TypeError(node)

    v = ev(expr, ())
    for a in args:
        v = v(a)
    return v, log
