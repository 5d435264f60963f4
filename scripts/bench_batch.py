#!/usr/bin/env python
"""Batched-SIMD stretch artifact (BASELINE.json configs[4]: "1000s of packed
ciphertexts"; VERDICT r4 missing #3).

Sustained mul+relin throughput at B >= 1024 ciphertexts per jitted call on
the real chip: the fused Mosaic kernels run at their VMEM sweet spot
(Bt=16 per fused call, Shoup hint pairs, 100 MB cap) and batches beyond
that chunk through `lax.map` (mul_relin_pallas.mul_relin), so ONE XLA
program sustains the whole batch. Dispersion (median/IQR over windows) is
recorded per bench.py conventions.

Emits one JSON line to stdout and writes BATCH_r05.json at the repo root.
Env: BATCH_SIZES (comma list, default "256,1024"), BENCH_LOG_N, BENCH_NLIMB,
BENCH_SECONDS.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/alchemy_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import bench_on, log
    from alchemy_tpu.she.fast import FastParams

    log_n = int(os.environ.get("BENCH_LOG_N", "15"))
    nlimb = int(os.environ.get("BENCH_NLIMB", "8"))
    secs = float(os.environ.get("BENCH_SECONDS", "3.0"))
    sizes = [int(s) for s in
             os.environ.get("BATCH_SIZES", "256,1024").split(",")]

    accel = jax.devices()[0]
    impl = "vpu" if accel.platform == "cpu" else "pallas"
    p = FastParams.make(log_n, nlimb, zp=2, impl=impl)
    log(f"accelerator: {accel} | ring n=2^{log_n}, limbs={nlimb}, impl={impl}")

    points = {}
    for B in sizes:
        ops, per, stats = bench_on(accel, p, np.random.default_rng(0),
                                   secs, batch=B)
        points[f"B{B}"] = {
            "ops_per_s": round(ops, 2),
            "ms_per_ct_best": round(per * 1e3, 4),
            "ms_per_ct_median": round(stats["median"] * 1e3, 4),
            "ms_per_ct_iqr": round(stats["iqr"] * 1e3, 4),
            "windows": stats["windows"],
        }
        log(f"B={B}: {ops:.1f} ops/s ({per*1e3:.4f} ms/ct best, median "
            f"{stats['median']*1e3:.4f}, IQR {stats['iqr']*1e3:.4f})")

    rec = {
        "metric": f"bgv_mul_relin_batched_simd_n2e{log_n}_L{nlimb}",
        "unit": "ops/s",
        "config": "BASELINE.json configs[4] — 1000s of packed ciphertexts, "
                  "one jitted program, lax.map-chunked Bt=16 fused Mosaic "
                  "calls, Shoup hint pairs",
        "points": points,
        "device": str(accel),
    }
    print(json.dumps(rec), flush=True)
    out = os.path.join(_ROOT, "BATCH_r05.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
