"""Worker for tests/test_multihost.py::test_two_process_whole_program_and_hybrid
(VERDICT r4 missing #5, multi-host breadth): two jax.distributed CPU
processes (gloo) running

  A. the GSPMD-sharded WHOLE-PROGRAM path — the compiled arithmetic
     example through interp/jit_exec.py with the 'coeff' mesh axis
     spanning the process boundary, bit-identical to the single-device
     execution and decrypt-PASS, and
  B. the HYBRID distributed mul+relin (make_dist_mul_relin_hybrid) with
     'coeff' spanning the boundary, bit-exact vs the single-chip
     she/hybrid path.

Usage: python multihost_worker2.py <pid> <nproc> <port>
Prints "WORKER_OK" on success; any assertion failure exits nonzero.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from alchemy_tpu.parallel.multihost import init_multihost  # noqa: E402

ndev = init_multihost(f"127.0.0.1:{port}", nproc, pid, cpu_collectives="gloo")
assert ndev == nproc

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

# --- A. whole-program GSPMD across the process boundary -------------------
from alchemy_tpu.backend import xla_backend  # noqa: E402
from alchemy_tpu.core.cyc import Cyc  # noqa: E402
from alchemy_tpu.interp.eval import eval_ir  # noqa: E402
from alchemy_tpu.interp.jit_exec import jit_compile  # noqa: E402
from alchemy_tpu.interp.keys_hints import KeysHints  # noqa: E402
from alchemy_tpu.interp.pt2ct import pt2ct  # noqa: E402
from alchemy_tpu.nt.factor import totient  # noqa: E402
from alchemy_tpu.she.gadget import TrivGad  # noqa: E402
from alchemy_tpu.examples.arithmetic import M, M_MAP, PT, ZP, ZQS, addMul  # noqa: E402

bk = xla_backend()
rng = np.random.default_rng(4)          # same stream in every process
pt1 = Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), bk)
pt2 = Cyc.from_coeffs(M, (ZP,), rng.integers(0, ZP, totient(M)), bk)
ctx = KeysHints(3.0, seed=4, bk=bk)     # deterministic keys on both procs
compiled = pt2ct(addMul, res_ty=PT, m_map=M_MAP, zqs=ZQS, gad=TrivGad(),
                 ctx=ctx)
a1 = compiled.encrypt_arg(pt1, 0)
a2 = compiled.encrypt_arg(pt2, 1)

jsingle = jit_compile(compiled, [a1, a2])               # local reference
single = jsingle(a1, a2)
assert compiled.decrypt(single).equals(eval_ir(addMul, pt1, pt2))

mesh = Mesh(np.array(jax.devices()).reshape(1, nproc), ("limb", "coeff"))
jsh = jit_compile(compiled, [a1, a2], mesh=mesh)
sharded = jsh(a1, a2)
for cs, cf in zip(single.comps, sharded.comps):
    ref = np.asarray(cs.data)
    for shard in cf.data.addressable_shards:
        assert np.array_equal(np.asarray(shard.data), ref[shard.index]), \
            "whole-program shard mismatch"
txt = jsh.executable.as_text()
assert any(op in txt for op in (
    "all-reduce", "all-gather", "all-to-all", "collective-permute",
    "reduce-scatter")), "no collectives in the cross-process program"
print("WHOLE_PROGRAM_OK", flush=True)

# --- B. hybrid distributed mul+relin across the boundary ------------------
from alchemy_tpu.backend.ntt import intt_negacyclic  # noqa: E402
from alchemy_tpu.parallel.dist import (  # noqa: E402
    DistConfig,
    make_dist_mul_relin_hybrid,
    make_dist_ntt,
)
from alchemy_tpu.parallel.mesh import make_mesh  # noqa: E402
from alchemy_tpu.she import fast  # noqa: E402
from alchemy_tpu.she.fast import FastParams  # noqa: E402
from alchemy_tpu.she.hybrid import (  # noqa: E402
    HybridKS,
    hybrid_keygen_hint,
    mul_relin_hybrid,
)

L = 12
p = FastParams.make(7, L, zp=2)
n1 = 8
cfg = DistConfig(p=p, n1=n1, n2=p.n // n1)
mesh2 = make_mesh((1, 1, nproc))        # 'coeff' across the processes
hk = HybridKS.make(p)
rng = np.random.default_rng(21)
s, (hb, ha) = hybrid_keygen_hint(hk, rng)
cts_a = [fast.encrypt(p, s, rng.integers(0, p.zp, p.n), rng)
         for _ in range(2)]
cts_b = [fast.encrypt(p, s, rng.integers(0, p.zp, p.n), rng)
         for _ in range(2)]
wants = [
    np.asarray(intt_negacyclic(
        mul_relin_hybrid(hk, a, b, hb, ha), p.n, p.qs))
    for a, b in zip(cts_a, cts_b)
]


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
    sh = NamedSharding(mesh2, P(*([None] * (host_np.ndim - 1) + ["coeff"])))
    return jax.make_array_from_callback(host_np.shape, sh,
                                        lambda idx: host_np[idx])


def to_host(garr):
    return np.asarray(multihost_utils.process_allgather(garr, tiled=True))


fwd_b, inv_b = make_dist_ntt(cfg, mesh2)
cfg_e = DistConfig(p=hk.pe, n1=n1, n2=p.n // n1)
fwd_e, _ = make_dist_ntt(cfg_e, mesh2)


def bridge(rows, qs, fwd):
    coeff = np.asarray(intt_negacyclic(jnp.asarray(rows), p.n, qs))
    return to_host(fwd(global_arr(to_dist_layout(coeff))))


d_a = bridge(np.stack([np.asarray(c) for c in cts_a]).reshape(4, L, p.n),
             p.qs, fwd_b).reshape(2, 2, L, p.n)
d_b = bridge(np.stack([np.asarray(c) for c in cts_b]).reshape(4, L, p.n),
             p.qs, fwd_b).reshape(2, 2, L, p.n)


def bridge_hint(hrows):
    h4 = np.concatenate(
        [np.asarray(hrows), np.zeros_like(np.asarray(hrows[:1]))], axis=0)
    return bridge(h4, hk.pe.qs, fwd_e)[:3]


d_hb, d_ha = bridge_hint(hb), bridge_hint(ha)

run = make_dist_mul_relin_hybrid(hk, cfg, mesh2)
out = run(global_arr(d_a), global_arr(d_b),
          global_arr(d_hb), global_arr(d_ha))
got = to_host(inv_b(global_arr(to_host(out).reshape(4, L, p.n))))
got = from_dist_layout(got).reshape(2, 2, L, p.n)
for i in range(2):
    assert np.array_equal(got[i], wants[i].reshape(2, L, p.n)), \
        f"hybrid cross-process row {i}"
print("HYBRID_OK", flush=True)

print("WORKER_OK", flush=True)
