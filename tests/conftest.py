"""Test configuration: force an 8-device virtual CPU mesh.

Sharding logic must be testable without TPU hardware (SURVEY.md §4): tests run
on the host CPU with 8 virtual XLA devices so `jax.sharding.Mesh` paths
compile and execute; determinism tests compare 1-device vs 8-device renders.

Note: this image pins JAX_PLATFORMS=axon via sitecustomize and ignores the
env override, so the platform is forced through jax.config instead. Keeping
tests off the TPU also avoids serializing on the single axon tunnel.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# Test tiers (VERDICT r3 item 10): `-m quick` is the fast unit tier; the
# golden/parallel/gradient renders are opt-in (`-m golden` or no marker
# filter). Membership is by module — the heavy modules are the ones whose
# tests render at golden spp or spawn processes/meshes.
_GOLDEN_MODULES = {
    "test_parity", "test_parallel", "test_grad", "test_bpt", "test_ppm",
    "test_render", "test_scenes", "test_wavefront", "test_instancing",
    "test_inverse", "test_checkpoint", "test_env", "test_features",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _GOLDEN_MODULES:
            item.add_marker(pytest.mark.golden)
        else:
            item.add_marker(pytest.mark.quick)


jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent XLA compile cache: the heavy BPT/grad test programs compile once
# per code change instead of once per pytest invocation (2-core host).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "xla_gpu_per_fusion_autotune_cache_dir")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Full-suite runs accumulate live compiled programs + their device
    buffers across ~20 modules (observed >7 GB RSS) and the CPU XLA
    runtime eventually segfaults inside the late PPM module; dropping the
    in-process jit cache at module teardown keeps the footprint bounded
    (recompiles hit the persistent cache above, so the time cost is
    small)."""
    yield
    jax.clear_caches()
