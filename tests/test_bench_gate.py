"""Unit tests for bench.py's same-epoch curate regression gate."""

from __future__ import annotations

import importlib.util
import pathlib


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", str(pathlib.Path(__file__).resolve().parent.parent
                         / "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_within_budget_passes():
    b = _bench()
    timings = {"quality_filter_pages": 1.5, "span_dedup_pages": 1.0,
               "host_cap_pages": 0.8, "dedup_exact_pages": 0.7,
               "pack_pages": 0.9}
    stages = {"quality+span_dedup": 5.0, "hosts+dedup": 2.0,
              "select_top+pack": 2.0}
    gate = b.curate_gate(timings, stages)
    assert gate["ok"]
    # budget = 2*(1.5+1.0)+4 = 9.0
    assert gate["units"]["quality+span_dedup"]["budget"] == 9.0


def test_regression_flags_unit():
    b = _bench()
    timings = {"quality_filter_pages": 1.5, "span_dedup_pages": 1.0,
               "host_cap_pages": 0.8, "dedup_exact_pages": 0.7,
               "pack_pages": 0.9}
    stages = {"quality+span_dedup": 20.0, "hosts+dedup": 2.0}
    gate = b.curate_gate(timings, stages)
    assert not gate["ok"]
    assert not gate["units"]["quality+span_dedup"]["ok"]
    assert gate["units"]["hosts+dedup"]["ok"]


def test_unknown_unit_passes_with_null_budget():
    """New stages must not be blocked by the gate — only known units are
    budgeted."""
    b = _bench()
    gate = b.curate_gate({}, {"brand_new_stage": 100.0})
    assert gate["ok"]
    assert gate["units"]["brand_new_stage"]["budget"] is None
