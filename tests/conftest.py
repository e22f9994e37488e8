"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU via
`--xla_force_host_platform_device_count=8` (the TPU-native replacement for
the reference's missing distributed tests — see SURVEY.md §4).

Env vars must be set before the first `import jax` anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax and registers the TPU backend at
# interpreter startup (before conftest), which pins jax_platforms=axon and
# makes the env vars above ineffective. Force CPU through the live config —
# this works even post-registration as long as no backend has initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
