"""Test configuration: run everything on an 8-device virtual CPU mesh.

The environment may pre-register a remote TPU backend (and force
``jax_platforms``) via sitecustomize before conftest runs, so we override via
jax.config and clear any already-initialized backends.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax.extend.backend import clear_backends  # noqa: E402

clear_backends()

jax.config.update("jax_threefry_partitionable", True)
