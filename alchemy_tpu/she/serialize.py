"""Checkpointing of keys and hints (SURVEY.md §5 checkpoint/resume).

The reference's only long-lived state is the accumulated Keys/Hints returned
by runKeysHints (KeysHints.hs:47-53; HomomRLWR carries keys out of the
compile phase to decrypt later, HomomRLWR.hs:55-70). Here the same state —
the KeysHints context — serializes to a single .npz plus metadata, so a
compiled pipeline can resume (re-encrypt/decrypt/evaluate) in a fresh
process; ciphertext jobs themselves are stateless.
"""

from __future__ import annotations

import json

import numpy as np

from alchemy_tpu.interp.keys_hints import KeysHints
from alchemy_tpu.she.keys import SK


def save_keys(ctx: KeysHints, path: str) -> None:
    """Persist the secret keys (hints are cheap to regenerate and are bound
    to compiled IR objects; keys are the root secrets)."""
    arrays = {}
    meta = []
    for m_prime, sk in ctx.keys.items():
        arrays[f"sk_{m_prime}"] = sk.coeffs
        meta.append({"m": m_prime, "variance": sk.variance})
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"r": ctx.r, "keys": meta}).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_keys(path: str, bk=None) -> KeysHints:
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    ctx = KeysHints(meta["r"], bk=bk)
    for entry in meta["keys"]:
        m = entry["m"]
        ctx.keys[m] = SK(m, entry["variance"], data[f"sk_{m}"].astype(np.int64))
    return ctx
