"""Guards on the driver's CORRECTNESS_r{N}.json artifact.

Round-4 post-mortem: the driver's sweep ran before 9 late-added queries
landed, so the artifact silently covered 50/59 registry entries. These
tests make the artifact's state loud:

* every entry the driver DID check must pass (rows+schema+hash, no err) —
  a regression recorded by the driver fails pytest immediately;
* every key in the artifact must still exist in the registry (no orphans
  from renames);
* registry keys NOT yet in the artifact are asserted to at least have a
  local oracle rehearsal (test_oracle_parity covers all of ORACLES at
  sf0.001), and their names are printed so the gap is visible in -v runs.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from cloud_data_quality_spark.plans.registry import ORACLES, QUERIES

REPO = Path(__file__).resolve().parent.parent


def latest_artifact() -> tuple[int, dict] | None:
    best = None
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, p)
    if best is None:
        return None
    return best[0], json.loads(best[1].read_text())


@pytest.fixture(scope="module")
def artifact():
    found = latest_artifact()
    if found is None:
        pytest.skip("no CORRECTNESS_r*.json yet (first round)")
    return found


def test_every_driver_checked_query_passes(artifact):
    rnd, data = artifact
    bad = {
        name: row for name, row in data.items()
        if row.get("err") is not None
        or not (row.get("rows_match") and row.get("schema_match"))
        or row.get("hash_match") is False  # None = rows-only check, allowed
    }
    assert not bad, f"CORRECTNESS_r{rnd:02d} records failures: {bad}"


def test_artifact_keys_still_registered(artifact):
    rnd, data = artifact
    orphans = set(data) - set(QUERIES)
    assert not orphans, (
        f"CORRECTNESS_r{rnd:02d} checked queries no longer in the registry "
        f"(rename without migration?): {sorted(orphans)}")


def test_unswept_queries_have_local_rehearsal(artifact, capsys):
    """Keys added after the driver's last sweep can't dodge verification:
    they must have a DuckDB oracle (so test_oracle_parity rehearses them
    at sf0.001 every pytest run) until the next driver sweep picks them up."""
    rnd, data = artifact
    pending = sorted(set(QUERIES) - set(data))
    no_oracle = [n for n in pending if n not in ORACLES]
    assert not no_oracle, (
        f"queries neither driver-checked (CORRECTNESS_r{rnd:02d}) nor "
        f"locally oracled: {no_oracle}")
    if pending:
        print(f"\n[pending driver sweep since r{rnd:02d}] {len(pending)} "
              f"quer{'y' if len(pending) == 1 else 'ies'}: {pending}")
