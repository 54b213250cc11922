import os

# Tests run on a virtual 8-device CPU mesh: sharding/pjit paths are exercised
# without TPU hardware, and results are deterministic across machines.
#
# NOTE: a sitecustomize on this image force-registers an 'axon' TPU plugin
# and sets jax.config.jax_platforms = "axon,cpu" at interpreter start,
# overriding the JAX_PLATFORMS env var. jax.config.update after import wins,
# so pin the platform here in addition to the env vars.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Hermetic suite: never let an e2e test (run.main) enable the persistent
# compile cache process-wide — XLA:CPU AOT cache load has segfaulted the
# suite when entries were written by a differently-configured or
# different-host CPU client (run.py:_enable_compile_cache honors this).
os.environ["NMCFLUID_NO_COMPILE_CACHE"] = "1"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables_between_modules():
    """Free jitted executables after each test module.

    The full suite compiles thousands of XLA:CPU programs; keeping every
    executable alive for the whole run segfaults LLVM's JIT memory
    manager deterministically ~85% in (inside backend_compile_and_load,
    compiling a trivial slice op — tests/test_spectral.py passes in
    isolation and crashes only after the preceding modules' compilations
    accumulate). Dropping the caches per module keeps the live-code
    footprint bounded; cross-module recompiles are minor since modules
    rarely share jit signatures."""
    yield
    jax.clear_caches()
