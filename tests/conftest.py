"""Test harness configuration.

All tests run on CPU with 8 virtual devices so multi-chip sharding can be
exercised without TPU hardware (SURVEY.md §4: "Multi-chip without
hardware").  The axon TPU plugin's ``sitecustomize`` imports jax and
registers the TPU platform at interpreter startup (before this conftest),
so ``JAX_PLATFORMS=cpu`` in the environment is too late; instead we switch
the platform in-process via ``jax.config`` before any backend is
initialized.  Set ``FALCON_TPU_TESTS_ON_TPU=1`` to run the suite against
the real chip instead.
"""

import os
import sys

if os.environ.get("FALCON_TPU_TESTS_ON_TPU") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
