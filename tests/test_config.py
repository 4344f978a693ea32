"""Declarative config layer: YAML → Catalyst compiler (SURVEY O5-O7, O17,
O21, O22, O24). Mirrors the reference's config tests
(/root/reference/tests/test_config.py:6-63) and its eu_authorities fixture
shape (151 rows, /root/reference/tests/test_pipeline.py:28)."""

from __future__ import annotations

import pandas as pd
import pytest

from investigraph_etl_spark.config import (
    PipelineConfig,
    build_pipeline,
    compile_column,
    compile_filters,
    deep_merge,
    inspect,
    resolve_handler,
    run_pipeline,
)

N_ROWS = 151  # the reference's golden count


@pytest.fixture(scope="module")
def authorities_csv(tmp_path_factory):
    path = tmp_path_factory.mktemp("fixtures") / "authorities.csv"
    rows = []
    for i in range(N_ROWS):
        cat = ["Agency", "Institution", "Body"][i % 3]
        status = "closed" if i % 10 == 0 else "open"
        rows.append(
            {
                "URL": f"https://example.eu/org/{i}",
                "Name": f"Authority Number {i}",
                "Category": cat,
                "Status": status,
            }
        )
    pd.DataFrame(rows).to_csv(path, index=False)
    return str(path)


@pytest.fixture(scope="module")
def cfg(authorities_csv):
    return PipelineConfig.from_dict(
        {
            "name": "authorities",
            "source": {"format": "csv", "path": authorities_csv},
            "filters": {"Category": ["Agency", "Institution"]},
            "filters_not": {"Status": "closed"},
            "columns": {
                "entity_id": {"key": ["URL", "Name"]},
                "name": {"column": "Name"},
                "alias": {"column": "Name", "split": " "},
                "label": {"template": "{Name} ({Category})"},
                "country": {"literal": "eu"},
                "summary": {"columns": ["Name", "Category"], "join": " — "},
            },
        }
    )


def test_deep_merge_override_wins_and_skips_empty():
    base = {"a": 1, "b": {"x": 1, "y": 2}, "c": 3}
    out = deep_merge(base, {"a": 9, "b": {"y": 5}, "c": None, "d": []})
    assert out == {"a": 9, "b": {"x": 1, "y": 5}, "c": 3}


def test_compiled_pipeline_shape_and_filters(spark, cfg):
    df = build_pipeline(spark, cfg)
    assert df.columns == ["entity_id", "name", "alias", "label", "country", "summary"]
    rows = df.collect()
    # 151 rows − Body category (50) − closed among remaining
    assert 0 < len(rows) < N_ROWS
    r0 = next(r for r in rows if r.name == "Authority Number 1")
    assert r0.alias == ["Authority", "Number", "1"]
    assert r0.label == "Authority Number 1 (Institution)"
    assert r0.country == "eu"
    assert r0.summary == "Authority Number 1 — Institution"
    assert len(r0.entity_id) == 64  # sha256 hex


def test_keygen_is_deterministic(spark, cfg):
    a = {r.name: r.entity_id for r in build_pipeline(spark, cfg).collect()}
    b = {r.name: r.entity_id for r in build_pipeline(spark, cfg).collect()}
    assert a == b


def test_filter_compiler_none_when_empty():
    assert compile_filters(None, None) is None


def test_compile_column_literal_and_str():
    from pyspark.sql import Column

    assert isinstance(compile_column("Name"), Column)
    assert isinstance(compile_column({"literal": 5}), Column)


def test_custom_handler_resolution_and_application(spark, cfg, tmp_path):
    handler_file = tmp_path / "custom.py"
    handler_file.write_text(
        "from pyspark.sql import functions as F\n"
        "def transform(df):\n"
        "    return df.withColumn('upper_name', F.upper(F.col('name')))\n"
    )
    cfg2 = PipelineConfig.from_dict(
        {
            "name": cfg.name,
            "source": cfg.source,
            "columns": {"name": {"column": "Name"}},
            "handlers": {"transform": f"{handler_file}:transform"},
        }
    )
    df = build_pipeline(spark, cfg2)
    assert "upper_name" in df.columns
    assert df.first().upper_name.startswith("AUTHORITY")


def test_resolve_handler_module_path():
    fn = resolve_handler("investigraph_etl_spark.cdc.resolve:resolve_lww")
    assert callable(fn)


def test_inspect_preview_limit(spark, cfg):
    assert inspect(spark, cfg, limit=5).count() == 5


def test_extract_only_dumps_records(spark, cfg, tmp_path):
    cfg.sink["records_uri"] = str(tmp_path / "records")
    out = run_pipeline(spark, cfg, extract_only=True)
    dumped = spark.read.json(out["records_uri"])
    assert dumped.count() == N_ROWS  # raw records, no filters applied


def test_run_pipeline_parquet_sink(spark, cfg, tmp_path):
    cfg.sink.update({"kind": "parquet", "uri": str(tmp_path / "out")})
    res = run_pipeline(spark, cfg)
    back = spark.read.parquet(res["uri"])
    assert back.columns == ["entity_id", "name", "alias", "label", "country", "summary"]
    assert back.count() == build_pipeline(spark, cfg).count()


def test_config_override_merge(authorities_csv):
    c = PipelineConfig.from_dict(
        {"name": "x", "source": {"format": "csv", "path": authorities_csv}},
        overrides={"source": {"options": {"sep": ","}}},
    )
    assert c.source["path"] == authorities_csv
    assert c.source["options"] == {"sep": ","}
