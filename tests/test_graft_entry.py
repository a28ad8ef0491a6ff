"""Driver entry-point contract: entry() compiles, dryrun self-bootstraps.

The round-1 failure mode (MULTICHIP_r01.json ok:false) was dryrun_multichip
assuming the virtual multi-device platform already existed.  These tests pin
both paths: inline (enough devices visible, as under pytest's 8-device
conftest) and subprocess bootstrap (more devices requested than visible,
as when the driver calls it on a bare 1-chip host).
"""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    res = jax.jit(fn)(*args)
    res = jax.block_until_ready(res)
    assert res.count.shape == (args[0].shape[0],)
    # The synthetic two-mode signal must yield at least one peak per window.
    assert int(np.min(np.asarray(res.count))) >= 1


def test_dryrun_inline_when_devices_suffice(capsys):
    # conftest provides 8 virtual CPU devices, so this must NOT subprocess.
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK on 8 devices" in out


def test_dryrun_bootstraps_subprocess_when_devices_missing():
    # 16 > the 8 visible devices: must spawn a child with a forced
    # 16-device virtual CPU platform and succeed there.
    graft.dryrun_multichip(16)


def test_impl_raises_clearly_without_devices():
    with pytest.raises(RuntimeError, match="auto-bootstrap"):
        graft._dryrun_multichip_impl(999)
