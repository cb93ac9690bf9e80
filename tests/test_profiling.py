"""utils.profiling: stage timers + trace wrapper (SURVEY §5 tooling)."""

import os

from amv_tpu.utils.profiling import StageTimes, stage_timer, trace


def test_stage_timer_accumulates():
    t = StageTimes()
    with stage_timer(t, "a"):
        pass
    with stage_timer(t, "a"):
        pass
    with stage_timer(t, "b"):
        pass
    assert set(t) == {"a", "b"}
    assert t["a"] >= 0.0
    assert "bench stages:" in t.report()


def test_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("AMV_TRACE_DIR", raising=False)
    with trace("x"):
        y = 1
    assert y == 1


def test_trace_writes_profile(tmp_path, monkeypatch):
    monkeypatch.setenv("AMV_TRACE_DIR", str(tmp_path))
    import jax.numpy as jnp
    with trace("unit"):
        jnp.arange(4).sum().block_until_ready()
    assert any(tmp_path.rglob("*")), "no trace output written"
