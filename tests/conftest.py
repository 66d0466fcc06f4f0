"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware (the standard
JAX fake-backend trick).

Note: this environment registers the TPU (axon) PJRT plugin in every Python
process via a sitecustomize hook that overrides ``jax_platforms`` — setting
the env var alone is not enough; we must update the config after import and
before any backend is initialized. Running tests on CPU also avoids blocking
on the single TPU chip's exclusive claim.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"


# --- test tiers -------------------------------------------------------------
# File-level markers so CI can slice the suite:
#   smoke  — fast unit/integration tests (default tier, < ~2 min total)
#   golden — frozen learning-quality floors (minutes; run before releases)
#   slow   — multi-minute model-training integration files
# Select with e.g. `pytest -m "not slow and not golden"` for the fast tier.

_GOLDEN_FILES = {"test_quality_goldens.py", "test_quality.py"}
_SLOW_FILES = {
    "test_neural_models.py",
    "test_sequential.py",
    "test_examples.py",
    "test_tutorials.py",
    "test_review_models.py",
    "test_text_models.py",
    "test_graph_visual_models.py",
    "test_explainable.py",
    "test_parallel.py",
    "test_basket.py",
    "test_bayes_social_models.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _GOLDEN_FILES:
            item.add_marker(pytest.mark.golden)
        elif fname in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.smoke)
