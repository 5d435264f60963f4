"""Exact numpy int64 backend — the golden model.

All residues are stored in [0, q) as int64; every product is reduced mod q
before accumulation so nothing exceeds 2^62. This backend is the bit-exact
oracle for the TPU backends (SURVEY.md §4 test plan (a)-(b)).
"""

from __future__ import annotations

import numpy as np


class GoldenBackend:
    name = "golden"

    # -- construction -------------------------------------------------------

    def asarray(self, arr: np.ndarray, qs: tuple[int, ...]) -> np.ndarray:
        a = np.asarray(arr, dtype=np.int64)
        if a.ndim == 1:
            a = np.broadcast_to(a[None, :], (len(qs), a.shape[0])).copy()
        out = a % np.asarray(qs, dtype=np.int64)[:, None]
        return out

    def to_numpy(self, a: np.ndarray) -> np.ndarray:
        return np.asarray(a, dtype=np.int64)

    def zeros(self, nlimb: int, n: int) -> np.ndarray:
        return np.zeros((nlimb, n), dtype=np.int64)

    # -- elementwise mod-q --------------------------------------------------

    def _q(self, qs) -> np.ndarray:
        return np.asarray(qs, dtype=np.int64)[:, None]

    def add(self, a, b, qs):
        return (a + b) % self._q(qs)

    def sub(self, a, b, qs):
        return (a - b) % self._q(qs)

    def neg(self, a, qs):
        return (-a) % self._q(qs)

    def mul(self, a, b, qs):
        return a * b % self._q(qs)

    def mul_const(self, a, consts, qs):
        """Multiply limb l by scalar consts[l] mod qs[l]."""
        c = np.asarray(consts, dtype=np.int64)[:, None] % self._q(qs)
        return a * c % self._q(qs)

    def sum_terms(self, terms, qs):
        """Sum a list of arrays mod q (safe: inputs already reduced)."""
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        return acc % self._q(qs)

    # -- per-axis tensor transforms -----------------------------------------

    def axis_matmul(self, a, mats, shape, qs):
        """Apply per-axis matrices along the tensor axes of a [L, n] array.

        mats: list over axes; mats[i] is either a numpy [d_out, d_in] matrix
        shared by all limbs, or a list of per-limb matrices. Output axis
        lengths may differ from input (embeddings/traces).
        """
        L = a.shape[0]
        q = np.asarray(qs, dtype=np.int64)
        cur_shape = list(shape)
        x = a.reshape(L, *cur_shape)
        for ax, mat in enumerate(mats):
            if mat is None:
                continue
            per_limb = isinstance(mat, (list, tuple))
            outs = []
            for l in range(L):
                M = np.asarray(mat[l] if per_limb else mat, dtype=np.int64) % q[l]
                xl = x[l]
                # move axis `ax` to front
                xl = np.moveaxis(xl, ax, 0)
                d_in = xl.shape[0]
                rest = xl.reshape(d_in, -1)
                prod = M[:, :, None] * rest[None, :, :] % q[l]
                res = prod.sum(axis=1) % q[l]
                res = res.reshape(M.shape[0], *xl.shape[1:])
                outs.append(np.moveaxis(res, 0, ax))
            cur_shape[ax] = outs[0].shape[ax]
            x = np.stack(outs, axis=0)
        return x.reshape(L, -1)

    # -- signed helpers (rescale path) --------------------------------------

    def lift_centered(self, a, qs):
        """Residues → centered signed representatives in (-q/2, q/2]."""
        q = self._q(qs)
        return np.where(a > q // 2, a - q, a)

    def reduce_signed(self, a_signed, qs):
        """Signed int64 values → residues mod per-limb q."""
        return a_signed % self._q(qs)

    def broadcast_row(self, row, nlimb, qs):
        """Take a single signed row [n] and reduce it into every limb."""
        q = self._q(qs)
        return np.broadcast_to(row[None, :], (nlimb, row.shape[0])) % q
