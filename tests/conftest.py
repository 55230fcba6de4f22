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

import signal

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "timeout(seconds): abort the test via SIGALRM if it runs longer "
        "(minimal in-repo stand-in for pytest-timeout, which is not "
        "installed — VERDICT r3 item 8: the bare mark was a silent no-op)")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    """Enforce @pytest.mark.timeout(N) with SIGALRM (main thread only)."""
    marker = item.get_closest_marker("timeout")
    if marker is None or not hasattr(signal, "SIGALRM"):
        yield
        return
    seconds = int(marker.args[0])

    def on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded timeout mark of {seconds}s (tests/conftest.py)")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
