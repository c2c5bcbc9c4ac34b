"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import
so multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 test strategy)."""

import os

# The image environment pins JAX_PLATFORMS=axon (single real TPU via a
# tunnel); tests must override it — they validate semantics + sharding on an
# 8-device virtual CPU mesh, and the TPU tunnel makes per-test compiles slow.
# NOTE: the axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, overriding the env var — so we must
# update the config AFTER importing jax, before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_slide():
    from path_gene_multimodal_tpu.io.slide import synthetic_wsi

    return synthetic_wsi(width=2048, height=1536, seed=7, n_blobs=3, nuclei_per_blob=60)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same stream it sees when run in
    # isolation — a shared session stream made data (and pass/fail, for
    # tolerance- or slot-count-sensitive tests) depend on execution order
    return np.random.default_rng(0)
