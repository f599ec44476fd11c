# -*- coding: utf-8 -*-
"""
Test configuration: force JAX onto a virtual 8-device CPU mesh (sharding
tests run without TPU hardware) and enable float64 so kernel parity tests
can compare against the float64 reference oracle.

NOTE: the environment pre-imports jax with JAX_PLATFORMS=axon (remote TPU
tunnel) via a sitecustomize hook, so we must override via jax.config --
env-var edits are too late -- before any backend is initialised.

"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
