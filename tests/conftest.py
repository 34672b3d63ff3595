"""Test configuration: run the whole suite on a CPU mesh of 8 virtual devices.

Multi-chip shardings are validated on this virtual mesh (the driver separately
dry-runs the multi-chip path); the real TPU chip is reserved for bench.py.
x64 is enabled so oracle-parity tests can check the reference's double-precision
tolerances; f32 smoke tests cover the TPU-native dtype.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(params=["float64", "float32"])
def dtype(request):
    import jax.numpy as jnp

    return {"float64": jnp.float64, "float32": jnp.float32}[request.param]


def tol_for(dtype) -> float:
    """Reference tolerance for f64, relaxed for f32."""
    import jax.numpy as jnp

    return 1e-3 if dtype == jnp.float64 else 5e-3
