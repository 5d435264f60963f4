import os

# Multi-device CPU mesh for sharding tests; TPU runs are driven by bench.py.
# The axon TPU plugin overrides JAX_PLATFORMS at import, so pin it again via
# jax.config after import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("ALCHEMY_NTT_IMPL", "vpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
