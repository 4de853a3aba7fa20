import os
import sys

# Force the 8-device virtual CPU mesh before jax backends initialize: tests
# run on a host-platform mesh, never over the (slow, tunneled) real TPU chip.
# NOTE: the container's sitecustomize force-sets JAX_PLATFORMS=axon, so the
# env var alone is not enough — jax.config.update below is what sticks.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))

# the mounted reference checkout doubles as a test oracle
REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)


# --------------------------------------------------------------------------- #
# Guard against reference class-attribute leakage between tests: the
# reference's IntersectionEnv mutates IDMVehicle *class* attributes when
# constructed (intersection_env.py:262-265), silently changing NPC behavior
# in every reference env created afterwards in the same process.  Snapshot
# and restore around every test so golden traces stay order-independent.
import pytest  # noqa: E402

_IDM_ATTRS = (
    "DISTANCE_WANTED",
    "COMFORT_ACC_MAX",
    "COMFORT_ACC_MIN",
    "TIME_WANTED",
    "DELTA",
    "ACC_MAX",
)


@pytest.fixture(autouse=True)
def _restore_reference_idm_class_attrs():
    try:
        from highway_env.vehicle.behavior import IDMVehicle
    except ImportError:
        yield
        return
    saved = {a: getattr(IDMVehicle, a) for a in _IDM_ATTRS}
    yield
    for a, v in saved.items():
        setattr(IDMVehicle, a, v)


# --------------------------------------------------------------------------- #
# Memoize env construction across tests: envs are immutable after build and
# hold their jitted step/reset, so reusing them avoids recompiling the same
# kernels in every test (the dominant cost of the parity suites).
def pytest_configure(config):
    import highwayenv_tpu as ht

    if getattr(ht.make, "_memoized", False):
        return
    orig_make = ht.make
    cache = {}

    def cached_make(env_id, config=None):
        key = (env_id, repr(sorted((config or {}).items(), key=repr)))
        if key not in cache:
            cache[key] = orig_make(env_id, config)
        return cache[key]

    cached_make._memoized = True
    ht.make = cached_make
