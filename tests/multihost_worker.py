"""Worker for tests/test_multihost.py: one of two jax.distributed CPU
processes running the coefficient-sharded distributed NTT with the 'coeff'
mesh axis spanning the PROCESS boundary (the DCN analog — SURVEY.md §2.4
communication backend; same shard_map program as single-process).

Usage: python multihost_worker.py <pid> <nproc> <port>
Prints "WORKER_OK" on success; any assertion failure exits nonzero.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ.setdefault("ALCHEMY_NTT_IMPL", "vpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from alchemy_tpu.parallel.multihost import init_multihost  # noqa: E402

ndev = init_multihost(f"127.0.0.1:{port}", nproc, pid, cpu_collectives="gloo")
assert ndev == nproc, ndev
assert jax.process_count() == nproc

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alchemy_tpu.backend.ntt import intt_negacyclic, ntt_negacyclic  # noqa: E402
from alchemy_tpu.backend.xla import mulmod  # noqa: E402
from alchemy_tpu.parallel.dist import DistConfig, make_dist_ntt  # noqa: E402
from alchemy_tpu.parallel.mesh import make_mesh  # noqa: E402
from alchemy_tpu.she.fast import FastParams  # noqa: E402

B, log_n, nlimb = 2, 6, 2
p = FastParams.make(log_n, nlimb, zp=2)
n1 = 8
cfg = DistConfig(p=p, n1=n1, n2=p.n // n1)
mesh = make_mesh((1, 1, nproc))  # ('batch','limb','coeff'); coeff crosses procs

rng = np.random.default_rng(0)  # same stream in every process
a = rng.integers(0, min(p.qs), p.n)
b = rng.integers(0, min(p.qs), p.n)


def to_dist_layout(coeffs):
    idx = np.empty(p.n, dtype=np.int64)
    for j2 in range(cfg.n2):
        for j1 in range(cfg.n1):
            idx[j2 * n1 + j1] = j1 * cfg.n2 + j2
    return coeffs[..., idx]


def from_dist_layout(stored):
    idx = np.empty(p.n, dtype=np.int64)
    for j2 in range(cfg.n2):
        for j1 in range(cfg.n1):
            idx[j1 * cfg.n2 + j2] = j2 * n1 + j1
    return stored[..., idx]


def global_arr(host_np):
    """Every process holds the full numpy value; build the sharded global
    jax.Array by serving each device its slice."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, None, "coeff"))
    return jax.make_array_from_callback(host_np.shape, sh,
                                        lambda idx: host_np[idx])


def host_stack(v):
    res = np.stack([v % q for q in p.qs]).astype(np.uint32)
    stored = to_dist_layout(res)
    return np.stack([stored] * B)  # [B, L, n]


fwd, inv = make_dist_ntt(cfg, mesh)

xa, xb = global_arr(host_stack(a)), global_arr(host_stack(b))

# 1. roundtrip across the process boundary
rt = inv(fwd(xa))
for shard in rt.addressable_shards:
    want = host_stack(a)[shard.index]
    assert np.array_equal(np.asarray(shard.data), want), "roundtrip mismatch"

# 2. pointwise mul in the sharded NTT domain == negacyclic ring mul
fa, fb = fwd(xa), fwd(xb)
prod = inv(mulmod(fa, fb, p.qs))
na = ntt_negacyclic(jnp.asarray(np.stack([a % q for q in p.qs]).astype(np.uint32)), p.n, p.qs)
nb = ntt_negacyclic(jnp.asarray(np.stack([b % q for q in p.qs]).astype(np.uint32)), p.n, p.qs)
ref = np.asarray(intt_negacyclic(mulmod(na, nb, p.qs), p.n, p.qs))
want_full = np.stack([to_dist_layout(ref)] * B)
for shard in prod.addressable_shards:
    assert np.array_equal(np.asarray(shard.data), want_full[shard.index]), \
        "sharded ring mul mismatch"

print("WORKER_OK", flush=True)
