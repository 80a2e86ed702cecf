"""Test harness: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before the first `import jax` anywhere in the test session.
"""

import os

# hard override: the harness boots every interpreter with the axon TPU backend
# registered (sitecustomize) and JAX_PLATFORMS=axon; env vars alone are ignored,
# so force the platform through jax.config. Tests must run on CPU with 8 virtual
# devices for determinism, fp32 matmuls, and sharding coverage.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NOTE: Pallas interpret mode is NOT enabled session-wide. Interpret-mode
# Pallas primitives inside the big sharded train-step jits can abort XLA's CPU
# compiler (SIGABRT observed on the round-1 suite); the kernel/op tests that
# need interpret coverage opt in per-module via a monkeypatch fixture instead
# (tests/test_ops.py, tests/test_pallas_scatter.py). Everything else runs the
# XLA fallback formulations, which is what CPU would execute in production.
os.environ.setdefault("PVCNN_TPU_PALLAS_INTERPRET", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
