"""Scaling-efficiency harness (BASELINE.md north star: ≥80% NTT scaling at
2+ hosts). Measures distributed-NTT throughput across mesh sizes on
whatever devices are available; on the 8-virtual-CPU test mesh this
validates the harness and the communication pattern, not silicon speed."""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from alchemy_tpu.parallel.dist import DistConfig, make_dist_ntt
from alchemy_tpu.parallel.mesh import make_mesh
from alchemy_tpu.she.fast import FastParams


def measure_dist_ntt(log_n: int = 12, nlimb: int = 4, coeff_shards: int = 2,
                     batch: int = 2, iters: int = 20):
    """Returns (seconds_per_call, mesh_shape) for the sharded forward NTT."""
    n_dev = len(jax.devices())
    shape = (max(n_dev // (2 * coeff_shards), 1), min(2, n_dev), coeff_shards)
    if int(np.prod(shape)) > n_dev:
        shape = (1, 1, min(coeff_shards, n_dev))
    mesh = make_mesh(shape)
    p = FastParams.make(log_n, nlimb, impl="vpu")
    n1 = 1 << (log_n // 2)
    cfg = DistConfig(p=p, n1=n1, n2=p.n // n1)
    fwd, _ = make_dist_ntt(cfg, mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.stack([np.stack([rng.integers(0, q, p.n) for q in p.qs])
                  for _ in range(batch)]).astype(np.uint32))
    y = fwd(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fwd(y)
    y.block_until_ready()
    _ = np.asarray(y[..., :1, :1])
    return (time.perf_counter() - t0) / iters, shape


if __name__ == "__main__":
    dt, shape = measure_dist_ntt()
    print(f"mesh {shape}: {dt*1e6:.0f} us per sharded NTT call")
