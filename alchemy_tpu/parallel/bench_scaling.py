"""Scaling-efficiency harness (BASELINE.md north star: ≥80% NTT scaling at
2+ hosts). Measures distributed-NTT throughput across mesh shapes and
DistNTT strategies on whatever devices are available; on the 8-virtual-CPU
test mesh this validates the harness and the communication pattern, not
silicon speed (the host serializes all virtual devices onto its cores).

`python -m alchemy_tpu.parallel.bench_scaling` writes one JSON dict to
stdout (the driver commits it as SCALING_r{N}.json each round)."""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from alchemy_tpu.parallel.dist import DistConfig, make_dist_ntt
from alchemy_tpu.parallel.mesh import make_mesh
from alchemy_tpu.she.fast import FastParams


def measure_dist_ntt(log_n: int = 12, nlimb: int = 4, coeff_shards: int = 2,
                     batch: int = 2, iters: int = 20, strategy: str | None = None):
    """Returns (seconds_per_call, mesh_shape) for the sharded forward NTT."""
    n_dev = len(jax.devices())
    # scale the 'coeff' axis; 'batch' stays 1 (fixed problem size) and 'limb'
    # takes one factor of 2 when devices allow (batch must stay divisible)
    limb = 2 if (2 * coeff_shards <= n_dev and nlimb % 2 == 0) else 1
    shape = (1, limb, min(coeff_shards, n_dev))
    mesh = make_mesh(shape)
    p = FastParams.make(log_n, nlimb, impl="vpu")
    n1 = 1 << (log_n // 2)
    cfg = DistConfig(p=p, n1=n1, n2=p.n // n1)
    fwd, _ = make_dist_ntt(cfg, mesh, strategy=strategy)
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


def sweep(log_n: int = 12, nlimb: int = 4, batch: int = 2, iters: int = 20):
    """Fixed-problem-size sweep over coeff shard counts and strategies."""
    n_dev = len(jax.devices())
    import multiprocessing

    out = {
        "log_n": log_n, "nlimb": nlimb, "batch": batch,
        "devices": n_dev,
        "platform": jax.default_backend(),
        "host_cores": multiprocessing.cpu_count(),
        "note": ("virtual-device runs validate the harness and communication "
                 "pattern, not silicon speed"),
        "points": [],
    }
    shards = [c for c in (1, 2, 4, 8) if c <= n_dev]
    for c in shards:
        for strat in (["a2a"] if c == 1 else ["a2a", "ring"]):
            dt, shape = measure_dist_ntt(log_n, nlimb, c, batch, iters, strat)
            out["points"].append({
                "coeff_shards": c, "strategy": strat, "mesh": list(shape),
                "us_per_call": round(dt * 1e6, 1),
            })
    base = out["points"][0]["us_per_call"]
    for pt in out["points"]:
        pt["speedup_vs_1shard"] = round(base / pt["us_per_call"], 3)
        pt["parallel_efficiency"] = round(
            base / (pt["us_per_call"] * pt["coeff_shards"]), 3)
    return out


if __name__ == "__main__":
    import os

    # the axon TPU plugin overrides JAX_PLATFORMS at import; honor an
    # explicit cpu request by re-pinning AFTER import (CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(sweep(), indent=1))
