"""Test harness config: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4(c): JAX's substitute for a fake multi-chip backend is
``--xla_force_host_platform_device_count``.  Must run before jax is imported.
"""

import os

# The harness exports JAX_PLATFORMS=axon (single remote TPU over a tunnel);
# tests must run on local CPU with 8 virtual devices, and the env var alone is
# overridden by the axon site hook, so force it through jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fast_eng_super_resolution_tpu.utils.env import setup_compilation_cache

setup_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_random_graph(rng, n=50, e=300, c_in=4, c_out=4, seed_offset=0):
    """A random connected-ish directed graph with edge lengths as attributes."""
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = rng.integers(0, n, size=e).astype(np.int32)
    edge_attr = np.linalg.norm(pos[senders] - pos[receivers], axis=1).astype(np.float32)
    edge_attr = np.maximum(edge_attr, 1e-3)[:, None]
    x = rng.normal(size=(n, c_in)).astype(np.float32)
    y = rng.normal(size=(n, c_out)).astype(np.float32)
    return dict(x=x, y=y, pos=pos, senders=senders, receivers=receivers, edge_attr=edge_attr)
