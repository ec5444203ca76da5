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


def latest_artifact() -> tuple[str, dict] | None:
    """Newest correctness artifact: the driver's CORRECTNESS_r{N}.json
    (highest N) or the local full sweep CORRECTNESS_full.json (written by
    `python bench.py --verify-all`), whichever file is newer on disk.
    `_`-prefixed keys are metadata, not query rows."""
    best = None
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, p)
    candidates = []
    if best is not None:
        candidates.append((f"r{best[0]:02d}", best[1]))
    full = REPO / "CORRECTNESS_full.json"
    if full.exists():
        candidates.append(("full", full))
    if not candidates:
        return None
    label, path = max(candidates, key=lambda c: c[1].stat().st_mtime)
    data = {k: v for k, v in json.loads(path.read_text()).items()
            if not k.startswith("_")}
    return label, data


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
    assert not bad, f"CORRECTNESS_{rnd} records failures: {bad}"


def test_artifact_keys_still_registered(artifact):
    rnd, data = artifact
    orphans = set(data) - set(QUERIES)
    assert not orphans, (
        f"CORRECTNESS_{rnd} checked queries no longer in the registry "
        f"(rename without migration?): {sorted(orphans)}")


def test_unswept_queries_have_local_rehearsal(artifact, capsys):
    """Keys added after the driver's last sweep can't dodge verification:
    they must have a DuckDB oracle (so test_oracle_parity rehearses them
    at sf0.001 every pytest run) until the next driver sweep picks them up."""
    rnd, data = artifact
    pending = sorted(set(QUERIES) - set(data))
    no_oracle = [n for n in pending if n not in ORACLES]
    assert not no_oracle, (
        f"queries neither driver-checked (CORRECTNESS_{rnd}) nor "
        f"locally oracled: {no_oracle}")
    if pending:
        print(f"\n[pending sweep since {rnd}] {len(pending)} "
              f"quer{'y' if len(pending) == 1 else 'ies'}: {pending}")
