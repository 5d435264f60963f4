"""Device meshes for the FHE workload (SURVEY.md §2.4).

Axes:
- 'batch': independent ciphertexts (pure data parallel, no cross-ct comms);
- 'limb':  RNS limbs (tensor parallel; cross-limb traffic only at gadget
           digit fan-out and rescale);
- 'coeff': ring coefficients (sequence parallel; the distributed NTT's
           all_to_all transpose is the only cross-chip step).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def pick_mesh_shape(n_devices: int, nlimb: int | None = None) -> tuple[int, int, int]:
    """Factor n_devices into (batch, limb, coeff), preferring limb×coeff
    parallelism that divides the problem axes."""
    def small_pow2(n):
        p = 1
        while n % 2 == 0:
            n //= 2
            p *= 2
        return p

    pow2 = small_pow2(n_devices)
    rest = n_devices // pow2
    # put up to 2 on limb, up to 2 on coeff, the rest (incl. odd part) on batch
    limb = 2 if pow2 >= 2 and (nlimb is None or nlimb % 2 == 0) else 1
    coeff = 2 if pow2 // limb >= 2 else 1
    batch = n_devices // (limb * coeff)
    assert batch * limb * coeff == n_devices
    return batch, limb, coeff


def make_mesh(shape: tuple[int, int, int], devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    assert len(devices) >= n, (len(devices), shape)
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, ("batch", "limb", "coeff"))
