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


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
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
