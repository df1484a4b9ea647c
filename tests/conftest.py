"""Test configuration: force an 8-device virtual CPU mesh.

The environment's sitecustomize registers the axon TPU backend and forces
``jax_platforms``; overriding via ``jax.config.update`` after import wins,
keeping the suite on host CPU with 8 virtual devices for sharding tests.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Silence XLA:CPU AOT-cache machine-feature preference warnings.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: jit programs compiled by one test run are
# reloaded by later runs (the suite is compile-dominated on a 1-core host).
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402,F401
import pytest  # noqa: E402

from visitron_tpu.testing import SyntheticWorld  # noqa: E402


@pytest.fixture(autouse=True)
def _pin_prng_impl():
    """The CLI sets jax_default_prng_impl per --rng_impl (run.main); keep that
    global mutation from leaking into other tests' seeded expectations."""
    impl = jax.config.jax_default_prng_impl
    yield
    jax.config.update("jax_default_prng_impl", impl)


@pytest.fixture(scope="session")
def world():
    return SyntheticWorld(seed=7, num_scans=2, viewpoints_per_scan=24,
                          scene_feat_dim=64, region_feat_dim=70)


@pytest.fixture(scope="session")
def big_world():
    return SyntheticWorld(seed=11, num_scans=1, viewpoints_per_scan=40,
                          scene_feat_dim=64, region_feat_dim=70)
