"""Schema tooling (SURVEY.md §1.2, §2.8 F14/F15): dotted-path
flattening of nested schemas and sample-based inference for
schemaless (document) sources.

Reference: Mongo schemas are inferred by sampling the latest 10
documents and recursively flattening nested fields to dotted paths
with a type per path (schema_handler.go:158-225); the type lattice is
{int, float, string, bool, date, object, array, null, unknown}
(:228-249). Spark-native: `spark.read.json` handles inference; these
helpers expose the same dotted-path/type view over any DataFrame
schema and drive dotted-path column selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_NAMES = {
    T.LongType: "int",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.DoubleType: "float",
    T.FloatType: "float",
    T.DecimalType: "float",
    T.StringType: "string",
    T.BooleanType: "bool",
    T.TimestampType: "date",
    T.DateType: "date",
    T.BinaryType: "binary",
    T.NullType: "null",
}


def _type_name(dt: T.DataType) -> str:
    if isinstance(dt, T.StructType):
        return "object"
    if isinstance(dt, (T.ArrayType, T.MapType)):
        return "array"
    for cls, name in _TYPE_NAMES.items():
        if isinstance(dt, cls):
            return name
    return "unknown"


def flatten_schema(schema: T.StructType, prefix: str = "", max_depth: int = 10) -> dict[str, str]:
    """F14: nested schema → {dotted.path: type_name}, object nodes
    included (like the reference's response, which lists both the
    object and its members)."""
    out: dict[str, str] = {}
    if max_depth < 0:
        return out
    for f_ in schema.fields:
        path = f"{prefix}{f_.name}"
        out[path] = _type_name(f_.dataType)
        if isinstance(f_.dataType, T.StructType):
            out.update(flatten_schema(f_.dataType, f"{path}.", max_depth - 1))
        elif isinstance(f_.dataType, T.ArrayType) and isinstance(
            f_.dataType.elementType, T.StructType
        ):
            out.update(flatten_schema(f_.dataType.elementType, f"{path}.", max_depth - 1))
    return out


def infer_json_schema(
    spark: SparkSession,
    docs: DataFrame,
    json_col: str,
    sample: int = 10,
    order_col: str | None = None,
) -> T.StructType:
    """Sample-based inference for a JSON string column (the
    schemaless-source path): latest-N sample → spark.read.json
    inference — W1's sort+limit feeding §1.2's inference.

    ``order_col`` names the recency column (the reference samples the
    latest N documents by natural order, schema_handler.go:160-171);
    when omitted we fall back to ``_seq``/``seq`` if present so the
    sampled set — and therefore the inferred schema — is stable
    across partitionings instead of depending on scan order.
    """
    if order_col is None:
        names = set(docs.columns)
        order_col = next((c for c in ("_seq", "seq", "doc_id", "id") if c in names), None)
    sampled = docs.select(json_col, *([order_col] if order_col else []))
    # drop null/empty docs BEFORE the limit so the sample is the
    # latest N USABLE documents (tombstones sorted to the top would
    # otherwise shrink — or empty — the inference input)
    sampled = sampled.filter(F.col(json_col).isNotNull() & (F.length(json_col) > 0))
    if order_col:
        sampled = sampled.orderBy(F.col(order_col).desc())
    sample_rows = [r[0] for r in sampled.limit(sample).collect()]
    rdd = spark.sparkContext.parallelize(sample_rows)
    # all-null/empty input yields StructType([]) — callers treating a
    # schemaless source as "no fields yet" is the Mongo behavior
    return spark.read.json(rdd).schema


def select_dotted(df: DataFrame, paths: list[str]) -> DataFrame:
    """Dotted-path projection with aliasing (a.b.c → a_b_c)."""
    return df.select(*[F.col(p).alias(p.replace(".", "_")) for p in paths])
