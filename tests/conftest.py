"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware.

This host's sitecustomize force-registers the 'axon' TPU backend at
interpreter startup (before conftest), and its register() overrides
JAX_PLATFORMS — so env vars alone are not enough: we must flip the config
after import but before any backend initialises, or tests silently run on
(and sometimes block forever against) the tunneled TPU."""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the growing/solver programs take minutes to
# compile on this 1-core host; cached compiles cut repeat suite runs a lot
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_collection_modifyitems(config, items):
    """Two test tiers (the r3 suite hit 43 min warm / >50 min cold, which is
    how the d8920dd dead-fixture slip happened — a suite too slow to run):
    tests marked ``slow`` are skipped unless FALDOI_SLOW_TESTS=1 or an
    explicit ``-m slow`` selection asks for them."""
    import pytest

    if os.environ.get("FALDOI_SLOW_TESTS"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(
        reason="slow tier (set FALDOI_SLOW_TESTS=1 or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
