"""Test harness config: run everything on a virtual 8-device CPU mesh so
sharding/collective code paths are exercised without TPU hardware
(SURVEY §4, implication (5))."""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The env vars above are not enough on boxes whose sitecustomize pre-imports
# jax with a TPU plugin (axon); force the CPU platform explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: do NOT enable the persistent compilation cache here.  On this box
# XLA:CPU's cache serialize/load path compiles against a generic machine
# profile (+prefer-no-gather/+prefer-no-scatter) that mismatches the host,
# and the loaded AOT executables MISEXECUTE (NaN images; the loader even
# warns "could lead to execution errors such as SIGILL").  Cold compiles
# cost ~6 min for the full suite — correctness wins.


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (multi-device mesh sweeps, "
             "compaction ladders — the full tier; see CLAUDE.md)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy mesh/compaction tests, skipped unless "
                   "--runslow (quick tier keeps `pytest -q` usable on the "
                   "1-core box)")


# Round-5 re-tier (VERDICT r4 item 7): the quick tier had drifted to
# ~45 min cold on the 1-core box.  Tests are tiered by MEASURED duration
# (python -m pytest tests/ -q --durations=80, 2026-08-21, this box,
# cold): everything >= ~22 s is listed here and runs only under
# --runslow, EXCEPT named representatives kept quick so every subsystem
# still has end-to-end coverage (one sorted-VJP==AD parity case, the
# flagship blockwise super64s2 case + its auto-selection policy, the
# scene-policy routing test, stride-2 sampling parity, camera-grads
# existence, jittered-VJP determinism, fastpath differentiability).
# Durations in comments are the measured seconds.  Measured quick tier
# after this split: ~9 min cold.
_SLOW_TESTS = {
    "tests/test_render.py::test_compacted_march_exact",             # 264
    "tests/test_occupancy.py::test_nondiff_with_occupancy_is_exact",  # 251
    "tests/test_parallel.py::TestTrainStepViews::test_accum_matches_serial",      # 89
    "tests/test_parallel.py::TestTrainStepViews::test_shard_map_matches_serial",  # 85
    "tests/test_grads.py::TestBlockwiseVJP::test_matches_monolithic[ad-auto-0]",  # 81
    "tests/test_render.py::test_choose_diff_renderer_timed_probe",  # 69
    "tests/test_occupancy.py::test_compaction_under_vmap",          # 59
    "tests/test_occupancy.py::test_wavefront_compaction_equivalent",  # 58
    "tests/test_grads.py::TestBlockwiseVJP::test_loss_args_traced",   # 57
    "tests/test_grads.py::TestBlockwiseVJP::test_matches_monolithic[ad-auto-2]",      # 56
    "tests/test_grads.py::TestBlockwiseVJP::test_matches_monolithic[sorted-super64-0]",  # 56
    "tests/test_render.py::test_render_depth_sorted_with_compaction_exact",  # 55
    "tests/test_torch_interop.py::test_camera_grads_sorted_matches_ad",  # 52
    "tests/test_torch_interop.py::test_camera_grads_opt_in",        # 48
    "tests/test_grads.py::TestSortedVJP::test_vmap_batched_grads",  # 44
    "tests/test_grads.py::TestBlockwiseVJP::test_matches_monolithic[sorted-super64-2]",  # 42
    "tests/test_render.py::test_render_strips_matches_render",      # 42
    "tests/test_torch_interop.py::test_backward_matches_jax_grad",  # 37
    "tests/test_render.py::test_ert_block_skip_equivalence",        # 35
    "tests/test_grads.py::TestBlockwiseVJP::test_matches_monolithic[sorted-super64s2-2]",  # 33
    "tests/test_render.py::test_render_depth_sorted_exact",         # 33
    "tests/test_grads.py::test_camera_grads_sorted_matches_ad[super64]",  # 32
    "tests/test_parallel.py::test_view_parallel_grads_match_single_device",  # 31
    "tests/test_torch_interop.py::test_batched_forward_and_grads",  # 31
    "tests/test_torch_interop.py::test_jitter_key_replay",          # 31
    "tests/test_grads.py::TestSortedVJP::test_uneven_dims_and_jitter",  # 31
    "tests/test_api.py::test_raycast_fast_api",                     # 30
    "tests/test_grads.py::TestTiledVJP::test_matches_ad[hw1-True]",   # 29
    "tests/test_grads.py::TestSortedVJP::test_matches_ad[131072-262144-False]",  # 28
    "tests/test_grads.py::TestSortedVJP::test_matches_ad[512-1024-False]",  # 27
    "tests/test_api.py::test_broadcast_rules",                      # 27
    "tests/test_parallel.py::test_fast_sharded_matches_unsharded[2]",  # 27
    "tests/test_parallel.py::test_fast_sharded_matches_unsharded[4]",  # 26
    "tests/test_grads.py::TestTiledVJP::test_matches_ad[hw0-True]",   # 26
    "tests/test_grads.py::TestSortedVJP::test_stride2_matches_ad[384-640]",  # 26
    "tests/test_fastpath.py::TestFidelityPolicy::test_gate_fail_falls_back_to_exact",  # 26
    "tests/test_torch_interop.py::test_torch_optimizer_step",       # 26
    "tests/test_grads.py::TestTiledVJP::test_matches_ad[hw1-False]",  # 25
    "tests/test_grads.py::TestTiledVJPContainmentCheck::test_valid_config_stays_finite",  # 25
    "tests/test_grads.py::TestTiledVJP::test_matches_ad[hw0-False]",  # 24
    "tests/test_grads.py::TestSortedVJP::test_matches_ad[131072-262144-True]",  # 24
    "tests/test_fastpath.py::TestFidelityPolicy::test_gate_pass_uses_shearwarp",  # 22
    "tests/test_grads.py::TestSortedVJP::test_stride2_matches_ad[131072-262144]",  # 22
}


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    seen = {item.nodeid for item in items}
    # Guard against silent rot: a listed ID that no longer matches any
    # collected test means the suite was renamed — fail loudly so the
    # tier list is maintained rather than silently re-inflating.
    stale = {t for t in _SLOW_TESTS if t not in seen}
    if stale and len(seen) >= 150:  # full-suite runs only, not subsets
        raise pytest.UsageError(
            f"conftest._SLOW_TESTS has stale entries: {sorted(stale)[:4]}")
    for item in items:
        if "slow" in item.keywords or item.nodeid in _SLOW_TESTS:
            item.add_marker(skip)


def _ensure_voliox():
    """Build the native ``_voliox`` extension if absent so
    ``tests/test_io.py`` exercises it instead of skipping (a fresh
    checkout has no built ``.so``; the build takes seconds)."""
    import glob
    import subprocess
    import sys
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not glob.glob(os.path.join(base, "differender_tpu", "_voliox*.so")):
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=base, capture_output=True, timeout=300, check=False)


_ensure_voliox()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The box's XLA:CPU client intermittently SEGFAULTS inside
    backend_compile late in a single long-lived process (observed twice,
    in different, individually-passing tests, always after 100+ prior
    compiles) — an accumulation-triggered compiler failure, not a test
    bug.  Dropping the executable cache per module keeps the client's
    live-compilation footprint bounded; the extra recompiles only affect
    fixtures shared across modules.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_sphere_volume(shape=(32, 32, 32), radius=0.6, soft=6.0):
    """Synthetic test volume: a soft-edged sphere (the reference's binary
    volumes are absent from its repo — `.MISSING_LARGE_BLOBS`; synthetic data
    is the test strategy, SURVEY §4)."""
    xs = [np.linspace(-1, 1, s, dtype=np.float32) for s in shape]
    g = np.meshgrid(*xs, indexing="ij")
    r = np.sqrt(sum(x * x for x in g))
    return (1.0 / (1.0 + np.exp(soft * (r - radius) * 8.0))).astype(np.float32)


def make_shell_volume(shape=(32, 32, 32), r0=0.4, r1=0.7):
    xs = [np.linspace(-1, 1, s, dtype=np.float32) for s in shape]
    g = np.meshgrid(*xs, indexing="ij")
    r = np.sqrt(sum(x * x for x in g))
    return ((r > r0) & (r < r1)).astype(np.float32) * 0.8


@pytest.fixture(scope="session")
def sphere_volume():
    return make_sphere_volume()


@pytest.fixture(scope="session")
def shell_volume():
    return make_shell_volume()
