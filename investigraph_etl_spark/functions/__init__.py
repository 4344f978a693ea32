"""Scalar/array function kernels (pure Catalyst expressions, JVM-side).

Every kernel here has two faces kept in lock-step:

- a PySpark ``Column`` builder (the engine's hot path — built-in
  ``pyspark.sql.functions`` only, whole-stage-codegen friendly, no Python UDFs);
- a DuckDB SQL string builder (suffix ``_sql``) producing the bit-identical
  ANSI-SQL expression, used by ``__spark_entry__.oracle_sql`` so the driver can
  verify each operator value-for-value against an independent engine.

Reference parity: the reference's scalar surface is slugify/fingerprint/
checksum/split/format (/root/reference/investigraph/util.py:25-42,
/root/reference/investigraph/model/mapping.py:9-21); this package re-expresses
those vectorized and adds the training-data kernels (tokenize, shingle,
language-ID, quality, MinHash, SimHash, cosine) the 100 TB pipeline needs.
"""
