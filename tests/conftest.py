"""
Test configuration: force JAX onto the host CPU platform with 8 virtual
devices so multi-chip sharding (data-parallel meshes over ICI) can be
exercised without TPU hardware.
"""
import os

os.environ['JAX_PLATFORM_NAME'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax
jax.config.update('jax_platforms', 'cpu')

import pathlib
import pytest

RESOURCES = pathlib.Path(__file__).parent / 'resources'


@pytest.fixture(scope='session')
def resources():
    return RESOURCES
