"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding logic is validated on
XLA's host-platform virtual devices (the reference has no distributed tests at
all — SURVEY.md §4; we go further and fake a mesh)."""

import os

# Must be set before jax is imported anywhere. Force CPU even if the outer
# environment points at a TPU (JAX_PLATFORMS=axon): unit tests validate logic,
# not hardware, and must not monopolize the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import numpy as np
import pytest

# A pytest plugin may have imported jax before this conftest ran, in which case
# the env var alone is too late — force the platform through the config as well
# (works as long as no backend has been initialized yet).
import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = pathlib.Path("/root/reference/llama.cpp")


@pytest.fixture(scope="session")
def reference_gguf_py():
    """The reference's gguf-py package, used as an independent test oracle."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference checkout not available")
    import sys
    import types

    # gguf-py's vocab module imports sentencepiece, which isn't installed and
    # isn't needed for the quant/container oracle — stub it out.
    if "sentencepiece" not in sys.modules:
        stub = types.ModuleType("sentencepiece")
        stub.SentencePieceProcessor = object
        sys.modules["sentencepiece"] = stub
    sys.path.insert(0, str(REFERENCE_ROOT / "gguf-py"))
    import gguf  # noqa: F401

    yield gguf
    sys.path.remove(str(REFERENCE_ROOT / "gguf-py"))


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
