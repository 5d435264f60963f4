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


def measure_comm_split(log_n: int, nlimb: int, coeff_shards: int,
                       batch: int = 2, iters: int = 20):
    """Isolate the transpose's cost on THIS transport: time the full dist
    NTT and a variant whose all_to_all is replaced by the shape-identical
    LOCAL chunk permutation (wrong values, zero communication — measurement
    only). The difference is the collective's cost; the local time is the
    per-shard compute the analytic ICI model scales."""
    from alchemy_tpu.parallel import dist as D

    def _a2a_local(x, axis_split, axis_concat, n_shards):
        C = n_shards
        chunks = jnp.split(x, C, axis=axis_split)
        return jnp.concatenate(chunks, axis=axis_concat)

    full, _ = measure_dist_ntt(log_n, nlimb, coeff_shards, batch, iters,
                               "a2a")
    D.DIST_STRATEGIES["__local__"] = _a2a_local
    try:
        local, _ = measure_dist_ntt(log_n, nlimb, coeff_shards, batch, iters,
                                    "__local__")
    finally:
        del D.DIST_STRATEGIES["__local__"]
    return full, local


def predict_ici_efficiency(log_n: int, nlimb: int, coeff_shards: int,
                           batch: int, t1_us: float, bw_GBps: float,
                           lat_us: float = 1.0) -> dict:
    """Analytic strong-scaling model for the a2a distributed NTT on real
    ICI silicon (VERDICT r3 #2b): per device and call,

      bytes_ici = batch · L_loc · (n/C) · 4 B · (C−1)/C   (the ONE tiled
                  all_to_all; every other stage is local — asserted on the
                  lowered HLO by test_dist_ntt_communication_pattern)
      T_comm    = bytes_ici / BW + lat
      T_comp    = t1_us / C     (t1_us: measured single-chip device time
                  for the same batch·L·n transform, BASELINE.md)
      efficiency = T_comp / (T_comp + T_comm)

    BW is the per-chip ICI bandwidth actually usable by the all_to_all in
    one direction; lat the dispatch/barrier cost."""
    n = 1 << log_n
    C = coeff_shards
    bytes_ici = batch * nlimb * (n // C) * 4 * (C - 1) / C
    t_comm = bytes_ici / (bw_GBps * 1e3) + lat_us   # GB/s = 1e3 B/us
    t_comp = t1_us / C
    return {
        "coeff_shards": C,
        "bytes_ici_per_device": int(bytes_ici),
        "t_comp_us": round(t_comp, 2),
        "t_comm_us": round(t_comm, 2),
        "efficiency": round(t_comp / (t_comp + t_comm), 3),
    }


def predict_full_op_efficiency(log_n: int, nlimb: int, coeff_shards: int,
                               limb_shards: int, batch: int, t1_op_us: float,
                               bw_GBps: float, lat_us: float = 1.0,
                               digit_mac_fraction: float = 0.84) -> dict:
    """Analytic strong-scaling model for the FULL distributed ciphertext
    mult+relin (VERDICT r4 missing #1: the NTT-only model left the limb
    all_gather and the L digit-NTT transposes unaccounted).

    Communication inventory per call (digit hint placement, a2a strategy —
    the collective pattern of make_dist_mul_relin, dist.py):
      1 inverse-NTT a2a of c2        : B·L_loc·(n/C)·4·(C−1)/C bytes
      1 all_gather of c2 rows (limb) : B·(L−L_loc)·(n/C)·4 bytes received
      L digit-NTT a2as               : L·B·L_loc·(n/C)·4·(C−1)/C bytes

    Compute anchor: t1_op_us = the measured single-chip fused op (the best
    known 1-chip implementation; efficiency answers "how much does
    communication erode perfect scaling of the headline number"). The L
    digit-NTT chains are dataflow-independent until the final accumulation,
    so their transposes can overlap other digits' butterflies (XLA async
    collectives; the chunked-transpose lever ALCHEMY_DIST_OVERLAP exposes
    the same independence INSIDE one transform). Both bounds are reported:
      serialized : every collective on the critical path
      pipelined  : digit-phase comm hidden under digit-phase compute up to
                   max(comp, comm) (digit_mac_fraction = the digit NTTs'
                   share of the op's MACs — 8.6 of 10.2 GMAC, BASELINE.md)
    """
    n = 1 << log_n
    C, LS, L = coeff_shards, limb_shards, nlimb
    L_loc = max(1, L // LS)
    n_loc = n // C
    b_intt = batch * L_loc * n_loc * 4 * (C - 1) / C
    b_ag = batch * (L - L_loc) * n_loc * 4
    b_dig = L * batch * L_loc * n_loc * 4 * (C - 1) / C
    kB = bw_GBps * 1e3  # bytes per us
    t_comp = batch * t1_op_us / (C * LS)
    n_coll = (1 if C > 1 else 0) + (1 if LS > 1 else 0) + (L if C > 1 else 0)
    t_comm_serial = (b_intt + b_ag + b_dig) / kB + n_coll * lat_us
    # pipelined: the digit phase runs at max(compute, comm); pre-phase
    # (tensor product + iNTT + all_gather) stays serial
    t_pre = (1 - digit_mac_fraction) * t_comp + (b_intt + b_ag) / kB \
        + (2 if LS > 1 else 1) * lat_us
    t_dig = max(digit_mac_fraction * t_comp, b_dig / kB + lat_us)
    eff_serial = t_comp / (t_comp + t_comm_serial)
    eff_pipe = t_comp / (t_pre + t_dig) if C > 1 or LS > 1 else 1.0
    return {
        "coeff_shards": C, "limb_shards": LS, "batch": batch,
        "bytes_intt_a2a": int(b_intt), "bytes_limb_allgather": int(b_ag),
        "bytes_digit_a2as": int(b_dig),
        "t_comp_us": round(t_comp, 2),
        "efficiency_serialized": round(eff_serial, 3),
        "efficiency_digit_pipelined": round(min(1.0, eff_pipe), 3),
    }


def weak_sweep(log_n_per_shard: int = 12, nlimb: int = 4, batch: int = 2,
               iters: int = 10):
    """Weak scaling: per-device coefficient count fixed at 2^log_n_per_shard
    — ring size grows with the shard count, so per-shard compute is constant
    and ideal time is flat. On the virtual mesh the host's physical cores
    cap the concurrency (points record the expected oversubscription)."""
    import multiprocessing

    n_dev = len(jax.devices())
    cores = multiprocessing.cpu_count()
    pts = []
    for c in (1, 2, 4, 8):
        if c > n_dev:
            continue
        dt, shape = measure_dist_ntt(log_n_per_shard + c.bit_length() - 1,
                                     nlimb, c, batch, iters, "a2a")
        pts.append({
            "coeff_shards": c, "log_n": log_n_per_shard + c.bit_length() - 1,
            "mesh": list(shape), "us_per_call": round(dt * 1e6, 1),
            "host_core_oversubscription": round(max(1.0, c / cores), 2),
        })
    base = pts[0]["us_per_call"]
    for pt in pts:
        # RAW weak-scaling efficiency only (VERDICT r4 weak #2: the old
        # core-normalized figure exceeded 1, proving the correction factor
        # too generous to mean anything). The honest statement: the raw
        # number, plus the fact that a host with `cores` physical cores
        # cannot measure >cores-way parallel efficiency at all — points
        # with host_core_limited=true are bounded by the host, not the
        # algorithm (the comm_split isolation quantifies the algorithm's
        # own communication share).
        pt["weak_efficiency"] = round(base / pt["us_per_call"], 3)
        pt["host_core_limited"] = pt["host_core_oversubscription"] > 1.0
    return pts


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

    # (a) weak scaling — fixed per-device work (VERDICT r3 #2a)
    out["weak_scaling"] = weak_sweep(log_n, nlimb, batch, iters=max(5, iters // 2))

    # (b) communication-cost isolation on this transport: full vs
    # local-permutation (no collective) variant; plus the chunked
    # OVERLAPPED transpose (ALCHEMY_DIST_OVERLAP=2) through the same
    # harness — on the host-serialized virtual mesh no overlap gain is
    # expected (there is no async transport), but the point demonstrates
    # the chunked path runs the same workload bit-exactly at comparable
    # cost; the overlap claim itself rests on the async-collective
    # structure (nc independent exchange/compute chains, asserted on the
    # lowering by test_dist_ntt_overlapped_transpose_bit_identical)
    import os as _os

    comm = []
    for c in (2, 4, 8):
        if c > n_dev:
            continue
        full, local = measure_comm_split(log_n, nlimb, c, batch,
                                         max(5, iters // 2))
        _os.environ["ALCHEMY_DIST_OVERLAP"] = "2"
        try:
            ov, _ = measure_dist_ntt(log_n, nlimb, c, batch,
                                     max(5, iters // 2), "a2a")
        finally:
            del _os.environ["ALCHEMY_DIST_OVERLAP"]
        comm.append({
            "coeff_shards": c,
            "full_us": round(full * 1e6, 1),
            "local_only_us": round(local * 1e6, 1),
            "collective_us": round((full - local) * 1e6, 1),
            "overlapped_chunks2_us": round(ov * 1e6, 1),
        })
    out["comm_split"] = comm

    # (c) analytic ICI prediction at the north-star rings, anchored on the
    # MEASURED single-chip device time (BASELINE.md round 4: the 2^15×8
    # transform runs 46 us amortized at queue depth 8) and a v5e ICI
    # bandwidth sweep; the collective pattern (ONE tiled all_to_all) is
    # pinned by test_dist_ntt_communication_pattern
    preds = []
    for ln, t1 in ((15, 46.0), (16, 92.0)):
        for bw in (50.0, 100.0, 200.0):
            for c in (2, 4, 8):
                for b in (1, 4):
                    e = predict_ici_efficiency(ln, 8, c, b, t1 * b, bw)
                    e.update({"log_n": ln, "batch": b, "ici_GBps": bw})
                    preds.append(e)
    out["ici_prediction"] = {
        "model": "T_comp = t1/C; T_comm = batch*L*(n/C)*4*(C-1)/C / BW + 1us; "
                 "eff = T_comp/(T_comp+T_comm); t1 measured on-chip "
                 "(46 us, 2^15 x 8 limbs, queue depth 8)",
        "comm_term_anchor": (
            "the affine bytes/BW + lat form is validated against a real "
            "transport in COMM_FIT_r05.json (isolated gloo a2a, 5 payload "
            "sizes, relative-weighted fit, residuals recorded)"),
        "points": preds,
    }

    # (d) FULL-OP model: the distributed mult+relin end-to-end — intt a2a +
    # limb all_gather + L digit-NTT a2as (VERDICT r4 missing #1). Anchor:
    # the measured single-chip fused op (BASELINE.md round 5). Batch
    # threshold: points list both the serialized lower bound and the
    # digit-pipelined bound (the L digit chains are dataflow-independent).
    full_pts = []
    t1_op = 223.7   # us/ct, n=2^15 L=8 fused Mosaic, round-5 measured
    for bw in (50.0, 100.0, 200.0):
        for c, ls in ((2, 1), (4, 1), (8, 1), (4, 2), (2, 2)):
            for b in (1, 4, 16):
                e = predict_full_op_efficiency(15, 8, c, ls, b, t1_op, bw)
                e.update({"log_n": 15, "ici_GBps": bw})
                full_pts.append(e)
    out["full_op_prediction"] = {
        "model": "see predict_full_op_efficiency docstring; "
                 "t1_op = measured 1-chip fused mult+relin per ct",
        "t1_op_us": t1_op,
        "points": full_pts,
    }
    return out


if __name__ == "__main__":
    import os

    # the axon TPU plugin overrides JAX_PLATFORMS at import; honor an
    # explicit cpu request by re-pinning AFTER import (CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(sweep(), indent=1))
