"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the survey's test plan (SURVEY.md §4): multi-chip logic is exercised
without a pod via ``--xla_force_host_platform_device_count``.

Note: the environment preloads jax with a TPU ("axon") platform via
sitecustomize, so env vars alone don't switch backends — we must update the
jax config in-process before any backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls for parity tests (SURVEY.md §7 hard part 5)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
