"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

This is the multi-device fake backend the reference lacks (SURVEY §4): sharding and
collective paths are exercised on any machine without TPU hardware.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # force: the session env may point at a TPU platform
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

# jax may already be imported (e.g. by a sitecustomize registering a TPU backend);
# env vars alone are then too late — override the live config before first device use.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# Persistent compilation cache: the suite's wall time is dominated by XLA CPU
# compiles of the same tiny programs every run; with a warm cache the full
# default tier drops from ~15-20 min to a few minutes on this 1-core box.
_cache_dir = os.path.expanduser('~/.cache/tacotron2_tpu_xla')
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
assert len(jax.devices()) == 8, 'tests require the 8-device virtual CPU mesh'

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        'markers',
        'kernel_tier: slow interpret-mode Pallas kernel parity case (opt-in: '
        '--kernel or T2_KERNEL_TESTS=1; one representative stays in the default tier)')


def pytest_addoption(parser):
    parser.addoption('--kernel', action='store_true', default=False,
                     help='also run the kernel_tier interpret-mode Pallas parity tests')


def pytest_collection_modifyitems(config, items):
    if config.getoption('--kernel') or os.environ.get('T2_KERNEL_TESTS') == '1':
        return
    skip = pytest.mark.skip(reason='kernel tier (run with --kernel or T2_KERNEL_TESTS=1)')
    for item in items:
        if 'kernel_tier' in item.keywords:
            item.add_marker(skip)


@pytest.fixture()
def hp():
    from tacotron2_tpu.config import default_hparams
    return default_hparams()
