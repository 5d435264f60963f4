"""Device-resident noise probe (VERDICT r3 #7; SURVEY.md §5 observability).

The reference's ERW computes `errorRate = max|errorTermUnrestricted sk ct|/q`
per op inside its (single, host-CPU) execution mode (reference
Crypto/Alchemy/Interpreter/ErrorRateWriter.hs:85-106, Eval.hs:150-160). The
rebuild's host probe (she/bgv.error_rate) does an exact per-coefficient CRT
lift in Python ints — O(n) host work per probe, impossible under
whole-program jit.

This module computes the SAME quantity with all O(n·L) work on device and
exactly (no float approximation), in the Garner mixed-radix digit domain
(she/hybrid.garner_digits — integer-only, jit-traceable):

  1. digits x_k of every coefficient's lift V ∈ [0, Q), V = Σ x_k·π_k;
  2. centering: V > Q/2 detected by msd-first digit comparison with the
     digits of Q//2 (the rescale_joint trick);
  3. |V_c| for the negative half by exact mixed-radix negation Q − V
     (complement digits + ripple carry — L static steps);
  4. the maximum over coefficients by an msd-first tournament (L masked
     max-reductions — lexicographic order in mixed radix IS numeric order).

Only the [L] digit vector of max_i |e_i| leaves the device; the final
rate = |e|/Q is an O(L) exact big-int division on host. Under a jit trace
the digit vector is a tracer — interp/jit_exec returns it as an auxiliary
output and interp/error_writer converts post-run, so strict ERW runs fully
jitted and batched.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from alchemy_tpu.she.hybrid import _garner_tables, garner_digits


@partial(jax.jit, static_argnums=(1,))
def max_abs_digits(res, qs: tuple[int, ...]):
    """uint32 residues [L, n] (pow basis) → [L] mixed-radix digits (lsd
    first, bases `qs`) of max_i |centered CRT lift of column i|."""
    L = len(qs)
    xs = garner_digits(res, qs)                      # L × [n]

    Q = 1
    for q in qs:
        Q *= q
    hd = []
    h = Q // 2
    for g in qs:
        hd.append(h % g)
        h //= g

    # V > Q//2 ⇔ negative half (centered lift V - Q)
    gt = jnp.zeros(xs[0].shape, dtype=bool)
    eq = jnp.ones(xs[0].shape, dtype=bool)
    for k in range(L - 1, -1, -1):
        gt = gt | (eq & (xs[k] > np.uint32(hd[k])))
        eq = eq & (xs[k] == np.uint32(hd[k]))
    is_neg = gt

    # |V_c| for the negative half: Q - V = complement digits + 1 (ripple
    # carry over the L static digit positions; V > Q/2 > 0 so no wrap)
    carry = jnp.ones(xs[0].shape, dtype=jnp.uint32)
    neg = []
    for k in range(L):
        t = (np.uint32(qs[k] - 1) - xs[k]) + carry
        wrap = t == np.uint32(qs[k])
        neg.append(jnp.where(wrap, jnp.uint32(0), t))
        carry = wrap.astype(jnp.uint32)
    digs = [jnp.where(is_neg, neg[k], xs[k]) for k in range(L)]

    # exact max over coefficients: msd-first masked tournament
    mask = jnp.ones(xs[0].shape, dtype=bool)
    out = [None] * L
    for k in range(L - 1, -1, -1):
        vals = jnp.where(mask, digs[k], jnp.uint32(0))
        m = jnp.max(vals)
        mask = mask & (digs[k] == m)
        out[k] = m
    return jnp.stack(out)


def rate_from_digits(digits, qs: tuple[int, ...]) -> float:
    """Exact host conversion of an [L] digit vector to max|e|/Q (an O(L)
    big-int evaluation — the only host arithmetic in the device probe)."""
    pi, _ = _garner_tables(tuple(qs))
    d = np.asarray(digits, dtype=np.int64)
    V = 0
    for k in range(len(qs)):
        V += int(d[k]) * pi[k]
    Q = 1
    for q in qs:
        Q *= q
    return float(V / Q)


@dataclass
class DeferredRate:
    """A probe result whose digits are still a traced (or device) array;
    interp/error_writer resolves it to a float after the jitted run."""

    digits: object
    qs: tuple[int, ...]

    def resolve(self) -> float:
        return rate_from_digits(np.asarray(self.digits), self.qs)


def _error_acc(sk, ct):
    """Σ c_k s^k over the ct chain, pow basis, on the ct's backend."""
    s = sk.as_cyc(ct.qs, ct.bk)
    acc = ct.comps[0]
    spow = None
    for k in range(1, len(ct.comps)):
        spow = s if spow is None else spow * s
        acc = acc + ct.comps[k] * spow
    return acc.to_pow()


def error_digits(sk, ct):
    """[L] max-|error| digit vector of a ciphertext, computed on device
    (jit-traceable; returns a tracer under trace)."""
    acc = _error_acc(sk, ct)
    return max_abs_digits(acc.data, acc.qs)


def error_rate_device(sk, ct) -> float:
    """she/bgv.error_rate (max|e_i|/Q, Eval.hs:158-160) with the O(n) work
    on device; bit-parity with the host probe is pinned by
    tests/test_noise_ledger.py."""
    return rate_from_digits(np.asarray(error_digits(sk, ct)), ct.qs)
