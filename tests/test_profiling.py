"""Profiling utilities (utils/profiling.py).

Regression tests for the round-1 advisor finding: a function inserted
between ``@contextlib.contextmanager`` and ``def trace`` stole trace's
decorator, making ``enable_persistent_compilation_cache`` a no-op
generator and ``trace`` a non-context-manager.
"""

import contextlib

import jax

from moviigen_tpu.utils import profiling


def test_enable_persistent_cache_is_plain_function():
    # Must run its body when called plainly (bench.py / cli/generate.py
    # call it without `with`); a stolen @contextmanager made it return an
    # unentered generator and silently never enable the cache.
    out = profiling.enable_persistent_compilation_cache("/tmp/jax_cache_t")
    assert not isinstance(out, contextlib._GeneratorContextManager)
    assert out is None
    if jax.default_backend() != "cpu":
        assert jax.config.jax_compilation_cache_dir == "/tmp/jax_cache_t"


def test_trace_is_context_manager(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: calls.append(("start", d)))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.append(("stop",)))
    with profiling.trace(str(tmp_path)):
        assert calls == [("start", str(tmp_path))]
    assert calls[-1] == ("stop",)


def test_phase_timer_accumulates():
    t = profiling.PhaseTimer(enabled=True)
    with t.phase("fwd"):
        pass
    with t.phase("fwd"):
        pass
    assert t.counts["fwd"] == 2
    assert "fwd=" in t.report()
