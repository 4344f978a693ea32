"""Declarative pipeline config: YAML → DataFrame-plan compiler.

The reference drives everything from a 5-stage YAML config hydrated into
pydantic models (/root/reference/investigraph/model/config.py:24-74) with
per-property declarative mappings — ``column``/``columns``, ``split``,
``join``, ``format``, ``template``, ``literal`` —
(/root/reference/investigraph/model/mapping.py:9-21), record filters
(/root/reference/investigraph/model/mapping.py:34-35), pandas playbook ops
(/root/reference/tests/fixtures/ec_meetings/config.yml:28-35), deep config
merge (/root/reference/investigraph/util.py:93-113), and bring-your-own-code
stage handlers resolved from ``module:func`` strings
(/root/reference/investigraph/model/stage.py:28-33).

This module re-expresses that surface Spark-first: every declarative construct
compiles to a Catalyst ``Column`` expression or a ``DataFrame -> DataFrame``
transform — nothing row-at-a-time. Custom handlers receive DataFrames and must
stay vectorized (the input_hint contract).

Example (mirrors the reference's eu_authorities fixture,
/root/reference/tests/fixtures/eu_authorities/config.yml:30-43)::

    name: authorities
    source:
      format: csv
      path: ./authorities.csv
      options: {header: "true"}
    filters:          # σ — all must hold (reference: check_filters)
      category: "Agency"
    filters_not:      # negative filters
      status: "closed"
    columns:
      entity_id: {key: [URL, name]}          # sha256 over key columns
      name: {column: Name}
      alias: {column: Name, split: " "}      # → array<string>
      label: {template: "{Name} ({Category})"}
      country: {literal: "eu"}
      summary: {columns: [Name, Category], join: " — "}
"""

from __future__ import annotations

import importlib
import importlib.util
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------- deep merge


def deep_merge(base: dict, override: dict) -> dict:
    """Config-layer deep merge: override wins, empty override values are
    skipped (reference semantics: ``pydantic_merge``,
    /root/reference/investigraph/util.py:93-113)."""
    out = dict(base)
    for k, v in override.items():
        if v is None or v == {} or v == []:
            continue
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


# --------------------------------------------------------- column compiler


def compile_column(spec: Any) -> Column:
    """Compile one property-mapping spec to a Catalyst Column.

    Supported keys (reference: PropertyMapping,
    /root/reference/investigraph/model/mapping.py:9-21):

    - ``column``: source column; with ``split``: → array<string>
    - ``columns`` + ``join``: concat_ws of several columns
    - ``template``: "{col} literal {col2}" → format_string (O7)
    - ``literal`` / ``literals``: constant value(s)
    - ``key`` / ``keys``: deterministic id = sha256(concat_ws('|', cols))
      (reference sha1-keying, /root/reference/investigraph/util.py:29-42)
    - ``format``: printf pattern applied to ``column``
    """
    if isinstance(spec, str):
        return F.col(spec)
    if not isinstance(spec, dict):
        return F.lit(spec)
    if "literal" in spec:
        return F.lit(spec["literal"])
    if "literals" in spec:
        return F.array(*[F.lit(v) for v in spec["literals"]])
    if "key" in spec or "keys" in spec:
        cols = spec.get("key") or spec.get("keys")
        cols = [cols] if isinstance(cols, str) else list(cols)
        return F.sha2(F.concat_ws("|", *[F.col(c) for c in cols]), 256)
    if "template" in spec:
        import re

        tpl = spec["template"]
        names = re.findall(r"\{(\w+)\}", tpl)
        pattern = re.sub(r"\{\w+\}", "%s", tpl)
        return F.format_string(pattern, *[F.col(n) for n in names])
    if "columns" in spec:
        sep = spec.get("join", " ")
        return F.concat_ws(sep, *[F.col(c) for c in spec["columns"]])
    col = F.col(spec["column"])
    if "format" in spec:
        col = F.format_string(spec["format"], col)
    if "split" in spec:
        col = F.split(col, spec["split"])
    return col


def compile_filters(
    filters: dict[str, Any] | None, filters_not: dict[str, Any] | None
) -> Column | None:
    """σ predicate: all ``filters`` hold AND no ``filters_not`` holds
    (reference: check_filters applied per record at
    /root/reference/investigraph/logic/transform.py:21 — here one Catalyst
    predicate, pushed down to the scan)."""
    pred: Column | None = None

    def _and(p, q):
        return q if p is None else (p & q)

    for k, v in (filters or {}).items():
        q = F.col(k).isin(*v) if isinstance(v, list) else (F.col(k) == F.lit(v))
        pred = _and(pred, q)
    for k, v in (filters_not or {}).items():
        q = ~F.col(k).isin(*v) if isinstance(v, list) else (F.col(k) != F.lit(v))
        pred = _and(pred, q)
    return pred


# ------------------------------------------------------------ stage handlers


def resolve_handler(spec: str) -> Callable:
    """Resolve a ``module:function`` or ``./file.py:function`` handler string
    (reference: get_func, /root/reference/investigraph/util.py:60-70).

    The callable must be vectorized: ``(DataFrame, ...) -> DataFrame``.
    """
    path, _, func = spec.rpartition(":")
    if not path:
        raise ValueError(f"handler spec needs 'module:func', got {spec!r}")
    if path.endswith(".py"):
        spec_ = importlib.util.spec_from_file_location("_custom_handler", path)
        mod = importlib.util.module_from_spec(spec_)
        spec_.loader.exec_module(mod)
    else:
        mod = importlib.import_module(path)
    return getattr(mod, func)


# ---------------------------------------------------------------- pipeline


@dataclass
class PipelineConfig:
    """Hydrated pipeline config (reference: Config model,
    /root/reference/investigraph/model/config.py:24-74)."""

    name: str
    source: dict[str, Any] = field(default_factory=dict)
    filters: dict[str, Any] | None = None
    filters_not: dict[str, Any] | None = None
    columns: dict[str, Any] = field(default_factory=dict)
    handlers: dict[str, str] = field(default_factory=dict)  # stage → module:func
    sink: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, raw: dict, overrides: dict | None = None) -> "PipelineConfig":
        merged = deep_merge(raw, overrides or {})
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in merged.items() if k in known})

    @classmethod
    def from_yaml(cls, path: str, overrides: dict | None = None) -> "PipelineConfig":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f), overrides)


def read_source(spark: SparkSession, source: dict[str, Any]) -> DataFrame:
    """O1/O4 scan: format + path + options → DataFrame (csv/json/parquet).

    The reference's mimetype dispatch (/root/reference/investigraph/logic/
    extract.py:23-38) becomes the reader format; its per-source pandas read
    options (/root/reference/investigraph/model/stage.py:44-55) become reader
    options.
    """
    fmt = source.get("format", "parquet")
    reader = spark.read.format(fmt)
    for k, v in (source.get("options") or {}).items():
        reader = reader.option(k, v)
    if fmt == "csv" and "header" not in (source.get("options") or {}):
        reader = reader.option("header", "true")
    return reader.load(source["path"])


def build_pipeline(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Compile the declarative config into one DataFrame plan:
    scan → σ (pushed down) → π (mapped columns) → optional custom transform.

    Stage handlers (O17): ``handlers.transform`` names a vectorized
    ``(DataFrame) -> DataFrame``; applied after the declarative mapping,
    mirroring the reference's custom transform override
    (/root/reference/tests/fixtures/eu_authorities.custom.yml:20-31).
    """
    df = read_source(spark, cfg.source)
    if "extract" in cfg.handlers:
        df = resolve_handler(cfg.handlers["extract"])(df)
    pred = compile_filters(cfg.filters, cfg.filters_not)
    if pred is not None:
        df = df.filter(pred)
    if cfg.columns:
        df = df.select(
            *[compile_column(spec).alias(name) for name, spec in cfg.columns.items()]
        )
    if "transform" in cfg.handlers:
        df = resolve_handler(cfg.handlers["transform"])(df)
    return df


def run_pipeline(
    spark: SparkSession, cfg: PipelineConfig, extract_only: bool = False
) -> dict[str, Any]:
    """Execute the configured pipeline into its sink.

    ``extract_only`` (O22): dump the scanned records as JSONL and skip
    mapping/sink (reference: /root/reference/investigraph/pipeline.py:151-155).
    Sink kinds: jsonl / parquet append (O15), lake MERGE (O16).
    """
    if extract_only:
        df = read_source(spark, cfg.source)
        out = cfg.sink.get("records_uri", f"/tmp/{cfg.name}-records")
        df.write.mode("overwrite").json(out)
        return {"records_uri": out}

    df = build_pipeline(spark, cfg)
    kind = cfg.sink.get("kind", "parquet")
    uri = cfg.sink.get("uri", f"/tmp/{cfg.name}-out")
    if kind == "jsonl":
        df.write.mode(cfg.sink.get("mode", "overwrite")).json(uri)
    elif kind == "parquet":
        df.write.mode(cfg.sink.get("mode", "overwrite")).parquet(uri)
    elif kind == "lake":
        from investigraph_etl_spark.cdc.apply import apply_events_batch
        from investigraph_etl_spark.lake.table import LakeTable

        table = LakeTable.load(spark, uri)
        return apply_events_batch(
            table, df, app_id=cfg.name, epoch_id=int(cfg.sink.get("epoch", 0))
        )
    else:
        raise ValueError(f"unknown sink kind: {kind!r}")
    return {"uri": uri, "kind": kind}


def inspect(spark: SparkSession, cfg: PipelineConfig, limit: int = 10) -> DataFrame:
    """O21 bounded preview: the compiled plan, first N rows (reference:
    /root/reference/investigraph/inspect.py:21-31)."""
    return build_pipeline(spark, cfg).limit(limit)
