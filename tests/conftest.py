"""Test configuration: force a virtual 8-device CPU platform.

Tests never touch the real TPU; multi-chip sharding logic runs on virtual
CPU devices (SURVEY.md §4d). bench.py / training use the real chip.

Note: this image's sitecustomize imports jax and registers the remote 'axon'
TPU plugin in every interpreter, so env-var overrides are too late —
``jax.config.update`` still works because backends initialise lazily, and
XLA_FLAGS is read at backend-init time.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
