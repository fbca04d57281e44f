from __future__ import annotations

import json
import shutil
import tempfile

import pytest

from climate_data_pipelines_spark.plans import runner


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="cdp_cli_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _args(argv):
    return runner.build_parser().parse_args(argv)


def test_runner_end_to_end(spark, sf_dir, outdir):
    args = _args(
        [
            "--input", f"{sf_dir}/events.parquet",
            "--output", outdir,
            "--start-year", "2024", "--start-month", "1",
            "--end-year", "2024", "--end-month", "6",
            "--lat-col", "user_id", "--lon-col", "event_id",
        ]
    )
    runner.validate(args)
    written = runner.run(args, spark=spark)
    assert written["observations"] == 1000
    back = spark.read.parquet(f"{outdir}/observations")
    assert {tuple(r) for r in back.select("year", "month").distinct().collect()} == {(2024, 1)}
    doc = json.loads(spark.read.text(f"{outdir}/geojson").first().value)
    assert doc["type"] == "FeatureCollection"


def test_runner_validation_rejects_inverted_range():
    args = _args(["--input", "x", "--output", "y", "--start-year", "2025", "--end-year", "2024"])
    with pytest.raises(SystemExit):
        runner.validate(args)


def test_runner_validation_rejects_wild_year():
    args = _args(["--input", "x", "--output", "y", "--start-year", "1800"])
    with pytest.raises(SystemExit):
        runner.validate(args)


def test_runner_skip_flags(spark, sf_dir, outdir):
    args = _args(
        [
            "--input", f"{sf_dir}/events.parquet",
            "--output", outdir,
            "--start-year", "2024", "--end-year", "2024", "--end-month", "12",
            "--skip-parquet", "--skip-geojson",
        ]
    )
    written = runner.run(args, spark=spark)
    assert written == {}
