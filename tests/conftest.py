"""Test configuration: force CPU backend with 8 virtual devices so kernel and
multi-chip sharding tests run anywhere (SURVEY.md §4 'Implication for the TPU
build').  Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's TPU plugin overrides JAX_PLATFORMS at import time; the
# config update wins over both.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from tpusparse.io import builder, mtx


@pytest.fixture
def small_coo():
    """Small power-law matrix, the default correctness fixture."""
    return builder.power_law_coo(200, 160, avg_nnz_per_row=6.0, seed=3)


@pytest.fixture
def uniform_small():
    return builder.uniform_coo(64, 48, nnz_per_row=4, seed=1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
