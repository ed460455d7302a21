"""Test harness configuration.

All tests run on CPU with 8 virtual devices so multi-chip sharding can be
exercised without TPU hardware (SURVEY.md §4: "Multi-chip without
hardware").  The axon TPU plugin registers itself from ``sitecustomize`` at
interpreter startup and wins over ``JAX_PLATFORMS`` set afterwards, so if
the environment is not already CPU-ready we re-exec the test process with a
corrected environment before anything imports jax.
"""

import os
import sys

_WANT = {
    "JAX_PLATFORMS": "cpu",
    "PALLAS_AXON_POOL_IPS": "",
}


def _needs_reexec() -> bool:
    if os.environ.get("FALCON_TPU_TESTS_ON_TPU") == "1":
        return False
    if "jax" in sys.modules and sys.modules["jax"] is not None:
        # Too late to change platforms; run as-is.
        return False
    return any(os.environ.get(k) != v for k, v in _WANT.items())


if _needs_reexec():
    env = dict(os.environ)
    env.update(_WANT)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
