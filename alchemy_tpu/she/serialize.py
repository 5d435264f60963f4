"""Checkpoint/resume of keys, hints and the compiled schedule (SURVEY.md §5).

The reference's only long-lived state is the accumulated Keys/Hints returned
by runKeysHints (KeysHints.hs:47-53; HomomRLWR carries keys out of the
compile phase to decrypt later, HomomRLWR.hs:55-70). The rebuild's resume
unit is larger — SURVEY §5: "serialize keys/hints + the compiled schedule" —
so a checkpoint holds:

- the KeysHints context (secret keys AND memoized quad-circ hints),
- the compiled ciphertext IR, including op payloads (public plaintexts,
  key-switch hints, tunnel hints, modSwitch targets),
- the typing the encryption boundary needs (arg/res PtTys, m'-map, RNS
  chain, gadget),
- optionally named ciphertexts (in-flight results).

Everything lands in one .npz: residue arrays as int64 plus one JSON
metadata blob; `load_checkpoint` rebuilds a working `CompiledExpr` in a
fresh process (encrypt/evaluate/decrypt all functional) on any backend.
"""

from __future__ import annotations

import json

import numpy as np

from alchemy_tpu.core.cyc import Cyc
from alchemy_tpu.core.ring import get_ring
from alchemy_tpu.interp.keys_hints import KeysHints
from alchemy_tpu.lang.ir import App, Lam, Node, Prim, Var
from alchemy_tpu.she.keys import SK


# ---------------------------------------------------------------------------
# keys only (round-1 surface, kept for compatibility)
# ---------------------------------------------------------------------------


def _rng_state(ctx: KeysHints) -> dict:
    """JSON-serializable snapshot of the context's RNG stream position
    (recorded for auditability; NOT restored — see _restore_rng)."""
    return ctx.rng.bit_generator.state


def _restore_rng(ctx: KeysHints, state: dict | None) -> None:
    """Always reseed the resumed context from OS entropy.

    Restoring the saved stream position would make every process resuming
    from the same checkpoint replay identical (a, e) encryption randomness
    under the same secret key (two resumed workers, or a crash-retry, then
    produce ciphertexts whose difference cancels the a·s mask and leaks the
    plaintext difference). Fresh entropy is always safe — nothing after
    resume needs the original stream, only non-reuse."""
    del state
    import secrets

    ctx.rng = np.random.default_rng(secrets.randbits(128))


def save_keys(ctx: KeysHints, path: str) -> None:
    """Persist the secret keys only (the root secrets)."""
    arrays = {}
    meta = []
    for m_prime, sk in ctx.keys.items():
        arrays[f"sk_{m_prime}"] = sk.coeffs
        meta.append({"m": m_prime, "variance": sk.variance})
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"r": ctx.r, "keys": meta, "rng": _rng_state(ctx)}).encode(),
        dtype=np.uint8,
    )
    np.savez_compressed(path, **arrays)


def load_keys(path: str, bk=None) -> KeysHints:
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    ctx = KeysHints(meta["r"], bk=bk)
    _restore_rng(ctx, meta.get("rng"))
    for entry in meta["keys"]:
        m = entry["m"]
        ctx.keys[m] = SK(m, entry["variance"], data[f"sk_{m}"].astype(np.int64))
    return ctx


# ---------------------------------------------------------------------------
# full checkpoint: keys + hints + compiled schedule (+ named ciphertexts)
# ---------------------------------------------------------------------------


class _Saver:
    def __init__(self):
        self.arrays: dict[str, np.ndarray] = {}
        self._n = 0
        self._hint_ids: dict[int, int] = {}
        self.hint_table: list[dict] = []

    def arr(self, a) -> str:
        name = f"a{self._n}"
        self._n += 1
        self.arrays[name] = np.asarray(a, dtype=np.int64)
        return name

    def cyc(self, c: Cyc) -> dict:
        return {
            "m": c.m, "qs": list(c.qs), "basis": c.basis,
            "ref": self.arr(c.bk.to_numpy(c.data)),
        }

    def gadget(self, g) -> dict:
        from alchemy_tpu.she.gadget import BaseBGad, HybridGad, TrivGad

        if isinstance(g, TrivGad):
            return {"t": "triv"}
        if isinstance(g, BaseBGad):
            return {"t": "baseb", "base": g.base}
        if isinstance(g, HybridGad):
            return {"t": "hybrid", "dnum": g.dnum, "sp_bits": g.sp_bits}
        raise TypeError(f"unserializable gadget {g!r}")

    def hint(self, h) -> int:
        """Serialize a hint once; later references share the table slot
        (quad hints are memoized in KeysHints AND referenced from the IR)."""
        if id(h) in self._hint_ids:
            return self._hint_ids[id(h)]
        from alchemy_tpu.she.bgv import KSQuadCircHint
        from alchemy_tpu.she.tunnel import TunnelHint

        if isinstance(h, KSQuadCircHint):
            entry = {
                "t": "quad", "m_prime": h.m_prime, "qs": list(h.qs),
                "gad": self.gadget(h.gadget), "zp": h.zp,
                "ext_qs": list(h.ext_qs) if h.ext_qs is not None else None,
                "rows": [[self.cyc(b), self.cyc(a)] for b, a in h.rows],
            }
        elif isinstance(h, TunnelHint):
            f = h.f
            entry = {
                "t": "tunnel",
                "f": {"e": f.e, "r": f.r, "s": f.s, "basis": f.basis,
                      "images": [self.cyc(c) for c in f.images]},
                "e_p": h.e_p, "r_p": h.r_p, "s_p": h.s_p,
                "qs": list(h.qs), "gad": self.gadget(h.gadget), "zp": h.zp,
                "images_sp": [self.cyc(c) for c in h.images_sp],
                "rows": [[[self.cyc(b), self.cyc(a)] for b, a in dim]
                         for dim in h.rows],
            }
        else:
            raise TypeError(f"unserializable hint {type(h).__name__}")
        self.hint_table.append(entry)
        idx = len(self.hint_table) - 1
        self._hint_ids[id(h)] = idx
        return idx

    def ir(self, node: Node) -> dict:
        if isinstance(node, Var):
            return {"t": "var", "i": node.idx}
        if isinstance(node, Lam):
            return {"t": "lam", "b": self.ir(node.body)}
        if isinstance(node, App):
            return {"t": "app", "f": self.ir(node.f), "a": self.ir(node.a)}
        if isinstance(node, Prim):
            out = {"t": "prim", "name": node.name, "ann": node.ann}
            p = node.payload
            if p is None:
                out["p"] = None
            elif isinstance(p, Cyc):
                out["p"] = {"k": "cyc", **self.cyc(p)}
            elif isinstance(p, dict) and set(p) == {"new_qs"}:
                out["p"] = {"k": "modswitch", "new_qs": list(p["new_qs"])}
            elif isinstance(p, (int, np.integer)):
                out["p"] = {"k": "int", "v": int(p)}
            else:
                out["p"] = {"k": "hint", "i": self.hint(p)}
            return out
        raise TypeError(f"unserializable IR node {node!r}")

    def ct(self, ct) -> dict:
        return {"m": ct.m, "zp": ct.zp, "scale": ct.scale,
                "comps": [self.cyc(c) for c in ct.comps]}


def save_checkpoint(compiled, path: str, cts: dict | None = None) -> None:
    """Persist a CompiledExpr (interp/pt2ct.py) — keys, hints and the
    compiled ciphertext program — plus optional named ciphertexts."""
    s = _Saver()
    ctx = compiled.ctx
    keys_meta = []
    for m_prime, sk in ctx.keys.items():
        keys_meta.append({"m": m_prime, "variance": sk.variance,
                          "ref": s.arr(sk.coeffs)})
    hints_meta = []
    for k, h in ctx.hints.items():
        kind, m_prime, qs, gad, zp = k
        hints_meta.append({"kind": kind, "m_prime": m_prime, "qs": list(qs),
                           "gad": s.gadget(gad), "zp": zp, "i": s.hint(h)})
    ir_meta = s.ir(compiled.ir)
    meta = {
        "version": 1,
        "r": ctx.r,
        "rng": _rng_state(ctx),
        "keys": keys_meta,
        "hints": hints_meta,
        "ir": ir_meta,
        "hint_table": s.hint_table,
        "arg_tys": [{"pnoise": t.pnoise, "m": t.m, "zp": t.zp}
                    for t in compiled.arg_tys],
        "res_ty": {"pnoise": compiled.res_ty.pnoise, "m": compiled.res_ty.m,
                   "zp": compiled.res_ty.zp},
        "m_map": [[k, v] for k, v in compiled.m_map.items()],
        "zqs": list(compiled.ledger.chain.qs),
        "gad": s.gadget(compiled.gad),
        "cts": {name: s.ct(c) for name, c in (cts or {}).items()},
    }
    s.arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **s.arrays)


class _Loader:
    def __init__(self, data, meta, bk):
        self.data = data
        self.meta = meta
        self.bk = bk
        self._hints: dict[int, object] = {}

    def cyc(self, d) -> Cyc:
        arr = self.data[d["ref"]].astype(np.int64)
        qs = tuple(d["qs"])
        return Cyc(get_ring(d["m"]), qs, d["basis"], self.bk.asarray(arr, qs),
                   self.bk)

    def gadget(self, d):
        from alchemy_tpu.she.gadget import BaseBGad, HybridGad, TrivGad

        if d["t"] == "triv":
            return TrivGad()
        if d["t"] == "baseb":
            return BaseBGad(d["base"])
        if d["t"] == "hybrid":
            return HybridGad(d["dnum"], d["sp_bits"])
        raise ValueError(d)

    def hint(self, i: int):
        if i in self._hints:
            return self._hints[i]
        d = self.meta["hint_table"][i]
        if d["t"] == "quad":
            from alchemy_tpu.she.bgv import KSQuadCircHint

            h = KSQuadCircHint(
                d["m_prime"], tuple(d["qs"]), self.gadget(d["gad"]), d["zp"],
                tuple((self.cyc(b), self.cyc(a)) for b, a in d["rows"]),
                ext_qs=tuple(d["ext_qs"]) if d["ext_qs"] is not None else None,
            )
        elif d["t"] == "tunnel":
            from alchemy_tpu.she.linear import LinearMap
            from alchemy_tpu.she.tunnel import TunnelHint

            fd = d["f"]
            f = LinearMap(fd["e"], fd["r"], fd["s"],
                          tuple(self.cyc(c) for c in fd["images"]), fd["basis"])
            h = TunnelHint(
                f, d["e_p"], d["r_p"], d["s_p"], tuple(d["qs"]),
                self.gadget(d["gad"]), d["zp"],
                [self.cyc(c) for c in d["images_sp"]],
                tuple(tuple((self.cyc(b), self.cyc(a)) for b, a in dim)
                      for dim in d["rows"]),
            )
        else:
            raise ValueError(d)
        self._hints[i] = h
        return h

    def ir(self, d) -> Node:
        t = d["t"]
        if t == "var":
            return Var(d["i"])
        if t == "lam":
            return Lam(self.ir(d["b"]))
        if t == "app":
            return App(self.ir(d["f"]), self.ir(d["a"]))
        if t == "prim":
            p = d["p"]
            if p is None:
                payload = None
            elif p["k"] == "cyc":
                payload = self.cyc(p)
            elif p["k"] == "modswitch":
                payload = {"new_qs": tuple(p["new_qs"])}
            elif p["k"] == "int":
                payload = p["v"]
            else:
                payload = self.hint(p["i"])
            return Prim(d["name"], payload, ann=d["ann"])
        raise ValueError(d)

    def ct(self, d):
        from alchemy_tpu.she.ct import CT

        return CT(d["m"], d["zp"], d["scale"],
                  tuple(self.cyc(c) for c in d["comps"]))


def load_checkpoint(path: str, bk=None):
    """Rebuild (CompiledExpr, named ciphertexts) from `save_checkpoint`."""
    from alchemy_tpu.core.params import RnsChain
    from alchemy_tpu.interp.noise import NoiseLedger, PtTy
    from alchemy_tpu.interp.pt2ct import CompiledExpr

    if bk is None:
        from alchemy_tpu.backend import golden_backend

        bk = golden_backend()
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    ld = _Loader(data, meta, bk)

    ctx = KeysHints(meta["r"], bk=bk)
    _restore_rng(ctx, meta.get("rng"))
    for entry in meta["keys"]:
        ctx.keys[entry["m"]] = SK(entry["m"], entry["variance"],
                                  data[entry["ref"]].astype(np.int64))
    for entry in meta["hints"]:
        key = (entry["kind"], entry["m_prime"], tuple(entry["qs"]),
               ld.gadget(entry["gad"]), entry["zp"])
        ctx.hints[key] = ld.hint(entry["i"])

    compiled = CompiledExpr(
        ir=ld.ir(meta["ir"]),
        arg_tys=tuple(PtTy(**t) for t in meta["arg_tys"]),
        res_ty=PtTy(**meta["res_ty"]),
        m_map={k: v for k, v in meta["m_map"]},
        ledger=NoiseLedger(RnsChain(meta["zqs"])),
        gad=ld.gadget(meta["gad"]),
        ctx=ctx,
    )
    cts = {name: ld.ct(d) for name, d in meta["cts"].items()}
    return compiled, cts
