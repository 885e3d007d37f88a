"""Preflight composition-validation machinery (utils/preflight.py).

The real canary costs a TPU compile, so these tests exercise the
subprocess harness, the ladder walk, and the in-process switch
application through cheap selftest targets (no jax import in the
children). The shipped ``default_canary`` composition itself is the
production vloso program, which `tests/test_vloso.py` covers on the CPU
mesh; its on-TPU clean/fault status is a hardware property validated per
revision (kernels/lstm.py "Known issue").
"""

import os

import pytest

from multimodal_sentiment_aanalysis_tpu.ops import rnn
from multimodal_sentiment_aanalysis_tpu.utils import preflight

pytestmark = pytest.mark.fast

_MOD = "multimodal_sentiment_aanalysis_tpu.utils.preflight"


def test_run_canary_clean():
    res = preflight.run_canary(f"{_MOD}:_selftest_clean", timeout=120)
    assert res.ok and res.returncode == 0


def test_run_canary_fault_detected():
    res = preflight.run_canary(f"{_MOD}:_selftest_fault", timeout=120)
    assert not res.ok and res.returncode == 134


def test_run_canary_bad_target():
    with pytest.raises(ValueError):
        preflight.run_canary("no-colon-here")


def test_ladder_finds_mitigation_and_applies_it():
    """_selftest_env_gated faults unless MSA_FUSED_LSTM=0: the ladder must
    land on that rung and flip the in-process dispatch switch."""
    old_env = os.environ.get("MSA_FUSED_LSTM")
    old_dispatch = rnn._FUSED_DISPATCH_ENABLED
    try:
        win, results = preflight.ensure_safe_dispatch(
            f"{_MOD}:_selftest_env_gated",
            ladder=({}, {"MSA_FUSED_LSTM": "0"}),  # 2-rung ladder: test speed
            timeout=120,
            verbose=False,
        )
        assert win == {"MSA_FUSED_LSTM": "0"}
        # the rung before the winner failed, winner passed
        assert [r.ok for r in results] == [False, True]
        assert rnn._FUSED_DISPATCH_ENABLED is False
        assert os.environ["MSA_FUSED_LSTM"] == "0"
    finally:
        rnn.enable_fused_dispatch(old_dispatch)
        if old_env is None:
            os.environ.pop("MSA_FUSED_LSTM", None)
        else:
            os.environ["MSA_FUSED_LSTM"] = old_env


def test_ladder_all_fail_returns_none():
    win, results = preflight.ensure_safe_dispatch(
        f"{_MOD}:_selftest_fault",
        ladder=({}, {"MSA_FUSED_LSTM": "0"}),
        timeout=120,
        verbose=False,
    )
    assert win is None and all(not r.ok for r in results)
    # nothing applied on failure
    assert rnn._FUSED_DISPATCH_ENABLED is True


def test_apply_dispatch_env_flips_all_switches():
    from multimodal_sentiment_aanalysis_tpu.kernels import (
        conv_stem_train as cst,
    )
    from multimodal_sentiment_aanalysis_tpu.kernels import lstm as lstm_mod
    from multimodal_sentiment_aanalysis_tpu.ops import losses

    saved = (
        rnn._FUSED_DISPATCH_ENABLED,
        lstm_mod._XPROJ_ENABLED,
        lstm_mod._BWDC_ENABLED,
        cst.dispatch_enabled(),
        losses._FUSED_INFONCE_ENABLED,
    )
    keys = ("MSA_FUSED_LSTM", "MSA_LSTM_XPROJ", "MSA_LSTM_BWDC",
            "MSA_FUSED_STEM", "MSA_FUSED_INFONCE")
    saved_env = {k: os.environ.get(k) for k in keys}
    try:
        preflight.apply_dispatch_env({k: "0" for k in keys})
        assert rnn._FUSED_DISPATCH_ENABLED is False
        assert lstm_mod._XPROJ_ENABLED is False
        assert lstm_mod._BWDC_ENABLED is False
        assert cst.dispatch_enabled() is False
        assert losses._FUSED_INFONCE_ENABLED is False
    finally:
        rnn.enable_fused_dispatch(saved[0])
        lstm_mod._XPROJ_ENABLED = saved[1]
        lstm_mod._BWDC_ENABLED = saved[2]
        cst.enable_dispatch(saved[3])
        losses.enable_fused_infonce(saved[4])
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_cli_flag_wiring(monkeypatch):
    """--preflight runs ensure_safe_dispatch before the subcommand."""
    from multimodal_sentiment_aanalysis_tpu import cli

    calls = []
    monkeypatch.setattr(
        preflight, "ensure_safe_dispatch",
        lambda *a, **k: (calls.append(1) or ({}, [])),
    )
    monkeypatch.setattr(
        cli, "cmd_inspect", lambda args: calls.append("cmd"), raising=True
    )
    cli.main(["inspect", "--tiny", "--preflight"])
    assert calls == [1, "cmd"]
