"""Pallas fused 4-step NTT kernel: logic validation in interpreter mode
(bit-identical to the jnp MXU path).

Native Mosaic execution is unavailable through the tunneled 'axon' TPU
platform used in this environment (even trivial pallas_call hangs); on a
directly-attached TPU the same kernels run natively. Set
ALCHEMY_PALLAS_NATIVE=1 to exercise the native path.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _patch_interpret(monkeypatch):
    from jax.experimental import pallas as pl

    import alchemy_tpu.backend.pallas.ntt_pallas as npk

    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(npk.pl, "pallas_call", patched)
    return npk


def test_pallas_ntt_interpret_bit_identical(monkeypatch):
    npk = _patch_interpret(monkeypatch)
    from alchemy_tpu.backend.ntt_mxu import ntt_mxu
    from alchemy_tpu.she.fast import FastParams

    p = FastParams.make(10, 2)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, p.n) for q in p.qs]).astype(np.uint32)
    xd = jnp.asarray(x)
    y_pl = npk.ntt_pallas(xd, p.n, p.qs)
    y_mx = ntt_mxu(xd, p.n, p.qs)
    assert np.array_equal(np.asarray(y_pl), np.asarray(y_mx))
    back = npk.intt_pallas(y_pl, p.n, p.qs)
    assert np.array_equal(np.asarray(back), x)


@pytest.mark.skipif(
    os.environ.get("ALCHEMY_PALLAS_NATIVE") != "1",
    reason="native Mosaic unavailable through the axon tunnel",
)
def test_pallas_ntt_native():
    from alchemy_tpu.backend.pallas.ntt_pallas import intt_pallas, ntt_pallas
    from alchemy_tpu.backend.ntt_mxu import ntt_mxu
    from alchemy_tpu.she.fast import FastParams

    p = FastParams.make(12, 4)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, p.n) for q in p.qs]).astype(np.uint32)
    xd = jnp.asarray(x)
    y = ntt_pallas(xd, p.n, p.qs)
    assert np.array_equal(np.asarray(y), np.asarray(ntt_mxu(xd, p.n, p.qs)))
    assert np.array_equal(np.asarray(intt_pallas(y, p.n, p.qs)), x)
