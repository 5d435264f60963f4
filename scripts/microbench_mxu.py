"""Is s8 x s8 -> s32 dot fast on this TPU (int8 MXU path)? Compare against
bf16 x bf16 -> f32 at the digit-NTT shapes. Run from repo root."""
from __future__ import annotations

import time
import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    x.block_until_ready()
    return np.asarray(x[..., :2, :2])


def timed(fn, x, iters=256):
    y = fn(x)
    sync(y)
    t0 = time.perf_counter()
    s = x
    for _ in range(iters):
        s = fn(s) if s.shape == x.shape else fn(x)
    sync(s)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    # digit-NTT stage-1 shape: [64 limb-pairs, 256 rows, K] @ [K, 128]
    R, K, M = 64 * 256, 128, 128

    a8 = jnp.asarray(rng.integers(-128, 127, (R, 4 * K)).astype(np.int8))
    w8 = jnp.asarray(rng.integers(-128, 127, (4 * K, M)).astype(np.int8))

    @jax.jit
    def dot8(x):
        return jax.lax.dot_general(
            x, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    t8 = timed(lambda x: (dot8(x) & 127).astype(jnp.int8), a8)
    flops8 = 2 * R * 4 * K * M
    print(f"s8 [R,4K]@[4K,M]:  {t8*1e6:8.1f} us  {flops8/t8/1e12:6.1f} Tops")

    ab = jnp.asarray(rng.integers(0, 255, (R, K)).astype(np.float32)).astype(jnp.bfloat16)
    wb = jnp.asarray(rng.integers(0, 255, (K, M)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def dotb(x):
        # 16 products like the current scheme
        out = None
        for _ in range(16):
            p = jax.lax.dot_general(x, wb, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            out = p if out is None else out + p
        return out

    tb = timed(lambda x: (dotb(x) % 255).astype(jnp.bfloat16)[:, :K], ab)
    flopsb = 2 * R * K * M * 16
    print(f"bf16 16x [R,K]@[K,M]: {tb*1e6:8.1f} us  {flopsb/tb/1e12:6.1f} Tflops")

    # one i32 check of exactness path: does dot8 produce exact sums?
    xa = np.asarray(a8[:4].astype(jnp.int32))
    ref = xa.astype(np.int64) @ np.asarray(w8).astype(np.int64)
    got = np.asarray(dot8(a8[:4]))
    print("s8 dot exact:", bool((ref == got).all()))


if __name__ == "__main__":
    main()
