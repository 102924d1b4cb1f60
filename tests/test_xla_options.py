"""MICHIGAN_COMPILER_OPTIONS parsing (utils/xla_options.py).

The env hook exists because the axon relay drops XLA_FLAGS; per-program
compiler_options travel with the PJRT compile request instead.
"""

import pytest

from michigan_tpu.utils.xla_options import compiler_options


def test_unset_returns_none(monkeypatch):
    monkeypatch.delenv("MICHIGAN_COMPILER_OPTIONS", raising=False)
    assert compiler_options() is None


def test_empty_returns_none(monkeypatch):
    monkeypatch.setenv("MICHIGAN_COMPILER_OPTIONS", "  ")
    assert compiler_options() is None


def test_parses_pairs(monkeypatch):
    monkeypatch.setenv(
        "MICHIGAN_COMPILER_OPTIONS",
        "xla_tpu_scoped_vmem_limit_kib=65536, xla_tpu_rwb_fusion=false")
    assert compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_rwb_fusion": "false",
    }


def test_value_may_contain_equals(monkeypatch):
    monkeypatch.setenv(
        "MICHIGAN_COMPILER_OPTIONS",
        "xla_tpu_memory_bound_loop_optimizer_options=enabled:true")
    assert compiler_options() == {
        "xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"}


def test_malformed_raises(monkeypatch):
    monkeypatch.setenv("MICHIGAN_COMPILER_OPTIONS", "notakeyvalue")
    with pytest.raises(ValueError):
        compiler_options()
