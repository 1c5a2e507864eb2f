import os
import sys

# The package is used from a clean checkout with no pip install: make
# laplace_gnn_tpu importable regardless of pytest's invocation directory.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Tests run on a virtual 8-device CPU mesh regardless of attached TPUs, so
# sharding paths are exercised everywhere (driver validates TPU separately).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon PJRT plugin (TPU tunnel) pins the platform at interpreter start;
# the config update below out-ranks it.
jax.config.update("jax_platforms", "cpu")

# Reference test-suite forces double precision for numerical tightness
# (tests/test_baselaplace.py:27); mirror that.
jax.config.update("jax_enable_x64", True)
