"""Ablation env-var fencing (VERDICT r4 weak #5 / next #8).

A stray VPT_STREAM_ABLATE etc. from a probe session must not silently
corrupt a golden (VPT_REQUIRE_GOLDENS) or benchmark run.
"""

import os

import pytest

from vpt_tpu import envguard


@pytest.fixture
def clean_env(monkeypatch):
    for k in list(os.environ):
        if k.startswith("VPT_"):
            monkeypatch.delenv(k)
    return monkeypatch


def test_defaults_are_clean(clean_env):
    assert envguard.poisoned_ablations() == []
    envguard.guard_ablations()  # no-op without VPT_REQUIRE_GOLDENS
    envguard.require_clean_env()


def test_guard_ignores_poison_without_goldens_mode(clean_env):
    clean_env.setenv("VPT_STREAM_ABLATE", "nomt")
    assert envguard.poisoned_ablations() == ["VPT_STREAM_ABLATE"]
    envguard.guard_ablations()  # probes are allowed outside goldens mode


@pytest.mark.parametrize(
    "var,value",
    [
        ("VPT_STREAM_ABLATE", "norows"),
        ("VPT_TRACE", "packet"),
        ("VPT_SORT_RAYS", "0"),
        ("VPT_STREAM_MT", "sparse"),
    ],
)
def test_goldens_mode_rejects_poisoned_var(clean_env, var, value):
    clean_env.setenv("VPT_REQUIRE_GOLDENS", "1")
    clean_env.setenv(var, value)
    with pytest.raises(RuntimeError, match=var):
        envguard.guard_ablations()


def test_goldens_mode_accepts_explicit_defaults(clean_env):
    clean_env.setenv("VPT_REQUIRE_GOLDENS", "1")
    clean_env.setenv("VPT_TRACE", "stream")
    envguard.guard_ablations()


def test_bench_env_rejects_any_vpt_var(clean_env):
    clean_env.setenv("VPT_CLUSTER_SIZE", "512")
    with pytest.raises(RuntimeError, match="VPT_CLUSTER_SIZE"):
        envguard.require_clean_env()


def test_bench_env_allows_goldens_flag(clean_env):
    clean_env.setenv("VPT_REQUIRE_GOLDENS", "1")
    envguard.require_clean_env()
