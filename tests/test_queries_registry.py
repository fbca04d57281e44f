from __future__ import annotations

import pytest

from climate_data_pipelines_spark.queries import REGISTRY


def test_registry_complete_and_documented():
    assert len(REGISTRY) >= 50
    for name, spec in REGISTRY.items():
        assert spec.doc, f"{name} undocumented"
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_at_smoke_sf(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, name
    assert len(df.columns) == len(set(df.columns)), f"{name}: duplicate column names"
    assert df.count() >= 0
