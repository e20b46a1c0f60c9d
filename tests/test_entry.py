"""Driver entry-point smoke tests: the multi-chip dry run on the virtual
8-device CPU mesh (conftest sets xla_force_host_platform_device_count=8)."""

import jax


def test_dryrun_multichip():
    import __graft_entry__ as ge
    n = min(8, len(jax.devices()))
    ge.dryrun_multichip(n)
