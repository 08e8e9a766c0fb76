"""Multi-host bootstrap heuristics (parallel/distributed.py).

The actual multi-host path can't run here (single machine); these tests
pin the env-var matrix and the failure semantics — in particular that a
failed initialize in a detected multi-host environment is LOUD (error
log / fatal under strict), never a silent fallback to a divergent
single-host fleet.
"""

import logging

import pytest

from moviigen_tpu.parallel import distributed as dist_mod


@pytest.fixture(autouse=True)
def clean_env(monkeypatch):
    for k in dist_mod._MULTI_HOST_ENV_VARS + (
            "MOVIIGEN_STRICT_DISTRIBUTED",):
        monkeypatch.delenv(k, raising=False)


@pytest.mark.parametrize("var", dist_mod._MULTI_HOST_ENV_VARS)
def test_each_launcher_var_triggers(monkeypatch, var):
    monkeypatch.setenv(var, "somehost:1234" if "ADDRESS" in var else "0")
    assert dist_mod.detect_multi_host_env() == [var]


def test_no_env_no_init(monkeypatch):
    """Single-host launch: no env vars → no initialize attempt."""
    called = []
    import jax
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: called.append(1))
    assert dist_mod.maybe_initialize_distributed() is False
    assert not called


def test_detected_env_failure_is_loud(monkeypatch, caplog):
    import jax
    monkeypatch.setenv("TPU_WORKER_ID", "0")

    def boom():
        raise ConnectionError("no coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with caplog.at_level(logging.ERROR):
        ok = dist_mod.maybe_initialize_distributed()
    assert ok is False
    assert any("divergent" in r.message and "TPU_WORKER_ID" in r.message
               for r in caplog.records), \
        "failure in a multi-host env must log an ERROR naming the trigger"


def test_strict_mode_is_fatal(monkeypatch):
    import jax
    monkeypatch.setenv("COORDINATOR_ADDRESS", "host:9999")

    def boom():
        raise ConnectionError("no coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="divergent"):
        dist_mod.maybe_initialize_distributed(strict=True)


def test_strict_env_var(monkeypatch):
    import jax
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host:9999")
    monkeypatch.setenv("MOVIIGEN_STRICT_DISTRIBUTED", "1")

    def boom():
        raise ConnectionError("no coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError):
        dist_mod.maybe_initialize_distributed()


def test_force_initialize_success(monkeypatch):
    import jax
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    assert dist_mod.maybe_initialize_distributed(force=True) is True
    assert calls == [1]


def test_already_initialized_short_circuits(monkeypatch):
    import jax

    class FakeState:
        client = object()

    monkeypatch.setattr(jax._src.distributed, "global_state", FakeState())

    def boom():
        raise AssertionError("must not re-initialize")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    assert dist_mod.maybe_initialize_distributed(force=True) is True
