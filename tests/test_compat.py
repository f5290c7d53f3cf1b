"""Compatibility-shim tests: the reference's own golden fixture.

The 4-record sample (3 valid regions + 1 unauthorized + sign rule) is the
embedded ``main()`` smoke harness from ``/root/reference/analysis.md:9`` —
the only golden test the reference repo contains."""

from __future__ import annotations

from enterprise_data_quality_platform_spark.compat import DataValidationPipeline

GOLDEN = [
    {"region": "North America", "timestamp": "2025-09-19T14:09:00Z", "value": 100},
    {"region": "Europe", "timestamp": "2025-09-19T14:10:00Z", "value": 250},
    {"region": "Asia Pacific", "timestamp": "2025-09-19T14:11:00Z", "value": 175},
    {"region": "South America", "timestamp": "2025-09-19T14:12:00Z", "value": 300},
]


def test_golden_fixture_matches_reference_behavior(spark):
    p = DataValidationPipeline(spark)
    out = p.run_all_validations(GOLDEN)
    assert out["total_validations"] == 4
    assert out["overall_status"] == "failed"  # South America violates
    by_name = {v["validation_name"]: v for v in out["results"]}
    assert by_name["data_quality"]["status"] == "passed"
    assert by_name["schema_compliance"]["status"] == "passed"
    assert by_name["region_whitelist"]["status"] == "failed"
    assert by_name["business_rules"]["status"] == "passed"
    assert out["passed"] == 3 and out["failed"] == 1


def test_missing_field_and_negative_value(spark):
    p = DataValidationPipeline(spark)
    data = [
        {"region": "Europe", "timestamp": "2025-09-19T14:10:00Z", "value": -5},
        {"region": "Europe", "value": 10},  # missing timestamp key
    ]
    out = p.run_all_validations(data)
    by_name = {v["validation_name"]: v for v in out["results"]}
    assert by_name["business_rules"]["status"] == "failed"
    assert by_name["schema_compliance"]["status"] == "failed"
    assert "timestamp" in by_name["schema_compliance"]["error_message"]


def test_wholly_missing_column(spark):
    p = DataValidationPipeline(spark)
    out = p.validate_schema_compliance([{"region": "Europe", "value": 1}])
    assert out["status"] == "failed"
    assert "timestamp" in out["error_message"]


def test_dataframe_input_fast_path(spark):
    df = spark.createDataFrame(GOLDEN)
    p = DataValidationPipeline(spark)
    assert p.validate_region_whitelist(df)["status"] == "failed"
    assert p.validate_data_quality(df)["status"] == "passed"
