"""Substrate tests: tolerances, helpers, config env handling."""

import numpy as np

from cfs_spmv_tpu.utils import config as config_mod
from cfs_spmv_tpu.utils.platform import (
    iceildiv,
    is_equal,
    rel_tolerance,
    round_up,
)


def test_tolerances_match_reference():
    # ref platform.hpp:27-37
    assert rel_tolerance(np.float32) == 1e-4
    assert rel_tolerance(np.float64) == 1e-8


def test_is_equal():
    assert is_equal([1.0, 2.0], [1.0, 2.0])
    assert is_equal(
        np.float32(1.0), np.float32(1.0 + 5e-5), dtype=np.float32
    )
    assert not is_equal(
        np.float32(1.0), np.float32(1.001), dtype=np.float32
    )
    assert is_equal(0.0, 0.0)


def test_iceildiv_roundup():
    assert iceildiv(10, 3) == 4
    assert iceildiv(9, 3) == 3
    assert round_up(1, 128) == 128
    assert round_up(128, 128) == 128
    assert round_up(129, 128) == 256


def test_env_int(monkeypatch):
    monkeypatch.setenv("CFS_NUM_DEVICES", "4")
    assert config_mod.env_int("CFS_NUM_DEVICES", 0) == 4
    monkeypatch.setenv("CFS_NUM_DEVICES", "")
    assert config_mod.env_int("CFS_NUM_DEVICES", 3) == 3


def test_env_flag(monkeypatch):
    monkeypatch.setenv("CFS_LOG", "true")
    assert config_mod.env_flag("CFS_LOG", False)
    monkeypatch.setenv("CFS_LOG", "0")
    assert not config_mod.env_flag("CFS_LOG", True)


def test_roofline_report():
    import numpy as np

    from cfs_spmv_tpu import COO, CSR, Format
    from cfs_spmv_tpu.tuning.tune import tune
    from cfs_spmv_tpu.utils.trace import report_spmv

    coo = COO.random(800, 800, 5.0, symmetric=True, bandwidth=40, seed=0)
    t = tune(CSR.from_coo(coo), fmt=Format.SSS)
    rep = report_spmv(t, t_iter=10e-6)
    assert rep.nnz_per_s == t.nnz_full / 10e-6
    assert 0 < rep.sol_fraction
    assert "Gnnz/s" in str(rep)


def test_profile_context(tmp_path):
    import jax
    import jax.numpy as jnp

    from cfs_spmv_tpu.utils.trace import profile

    try:
        with profile(str(tmp_path)):
            jnp.sum(jnp.ones(16)).block_until_ready()
    except Exception:  # profiler unavailable in some CPU builds
        return
    assert any(tmp_path.iterdir())
