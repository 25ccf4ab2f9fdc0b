"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS from the
environment, so the platform must be forced via jax.config before any
computation. Unit tests are hermetic on CPU; the real TPU chip is
reserved for bench runs.
"""

import os

if os.environ.get("SMTPU_TPU_TESTS") == "1":
    # hardware mode (tests/test_tpu_hardware.py): leave the TPU visible
    import jax  # noqa: F401
else:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
