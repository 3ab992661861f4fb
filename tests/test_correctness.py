"""Replicates the driver's t2 gate: every registered query vs its DuckDB
oracle at sf0.01 (row count + sorted column names + order-insensitive
values)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from insight_patents_spark import registry  # noqa: E402
from tools.check import compare  # noqa: E402

SPECS = registry.load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: runs and has stable schema
        return
    odf = duck.execute(spec.oracle).df()
    problems = compare(name, sdf, odf)
    assert not problems, "; ".join(problems)
