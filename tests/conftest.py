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
# Set through the environment as well as jax.config so that subprocesses
# spawned by tests (multihost workers, dryrun re-exec, CLI runs) inherit it.
_cache_dir = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# Tiny test models spend the suite's time in XLA compilation, not execution:
# skip most backend optimization passes (numerics unchanged; no fast-math).
jax.config.update("jax_disable_most_optimizations", True)
os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")

import numpy as np  # noqa: E402,F401
import pytest  # noqa: E402

# -- suite-wide speedup: route eager flax init/apply through jax.jit ---------
# Eager (un-jitted) dispatch on this 1-core host costs ~10-50 ms per XLA op,
# so a single un-jitted ``Module.init`` of even a tiny model takes ~10 s.
# Library code always jits its hot paths; tests call init/apply directly.
# Wrap both so array leaves are traced and every other argument (python
# bools/ints like ``deterministic``) is closed over statically — semantics
# identical, but each call is ONE compiled program, shared via the
# persistent compilation cache across tests and runs.
import flax.linen as _nn  # noqa: E402

# Eager fallbacks taken by the jit-routing wrapper below (e.g. non-jittable
# outputs).  Counted and reported at session end so a sudden spike — a real
# jit-incompatibility regression being silently masked — is visible.
JIT_ROUTE_FALLBACKS: list[str] = []

_ORIG_MODULE_INIT = _nn.Module.init
_ORIG_MODULE_APPLY = _nn.Module.apply


def _jit_entry(orig):
    def wrapper(self, *args, **kwargs):
        leaves, treedef = jax.tree.flatten((args, kwargs))
        is_dyn = [isinstance(l, (jax.Array, np.ndarray)) for l in leaves]
        dyn = [l for l, d in zip(leaves, is_dyn) if d]
        static = [None if d else l for l, d in zip(leaves, is_dyn)]

        def inner(dyn):
            it = iter(dyn)
            merged = [next(it) if d else s for s, d in zip(static, is_dyn)]
            a, kw = jax.tree.unflatten(treedef, merged)
            return orig(self, *a, **kw)

        try:
            return jax.jit(inner)(dyn)
        except Exception as e:
            JIT_ROUTE_FALLBACKS.append(
                f"{type(self).__name__}.{orig.__name__}: {type(e).__name__}")
            return orig(self, *args, **kwargs)  # e.g. non-jittable outputs

    return wrapper


_nn.Module.init = _jit_entry(_nn.Module.init)
_nn.Module.apply = _jit_entry(_nn.Module.apply)


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if JIT_ROUTE_FALLBACKS:
        from collections import Counter

        counts = Counter(JIT_ROUTE_FALLBACKS)
        terminalreporter.write_line(
            "conftest jit-routing eager fallbacks: "
            + ", ".join(f"{k} x{v}" for k, v in counts.most_common()))

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
