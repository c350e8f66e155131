"""Schema-enforced readers (the ingest side of the engine).

The reference's only ingest is ``json.loads`` of one array file at import
(``/root/reference/backend/tools.py:26-28``) with Pydantic validating just
the 9 API-surfaced fields (``backend/models.py:14-23``). Here ingest is
declarative: an explicit ``StructType`` + FAILFAST, so a malformed record
fails the read instead of poisoning downstream operators — the only
boundary-validation stance that survives 100 TB (you cannot eyeball bad
rows out of a petabyte lake; you quarantine them at the edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The full 14-field fan record (SURVEY.md §1.2; reference
#: ``backend/data/fans.json``). Dates arrive as strings and are parsed here.
FAN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("events_attended", T.ArrayType(T.StringType())),
        T.StructField("genres", T.ArrayType(T.StringType())),
        T.StructField("last_purchase_date", T.StringType()),
        T.StructField("total_spent", T.DoubleType()),
        T.StructField("email_open_rate", T.DoubleType()),
        T.StructField("email_click_rate", T.DoubleType()),
        T.StructField("subscribed", T.BooleanType()),
    ]
)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multiline: bool = True,
    mode: str = "FAILFAST",
) -> DataFrame:
    """JSON ingest with a declared schema (no inference pass over the data).

    Schema inference is a full extra scan and nondeterministic under schema
    drift — never acceptable on a lake-sized source. ``multiline=True``
    handles the reference's single-array file layout.
    """
    return (
        spark.read.schema(schema)
        .option("multiLine", multiline)
        .option("mode", mode)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    mode: str = "FAILFAST",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", mode)
        .csv(path)
    )


def parse_fan_dates(df: DataFrame) -> DataFrame:
    """Post-ingest typing: ``last_purchase_date`` string -> DateType."""
    return df.withColumn(
        "last_purchase_date", F.to_date("last_purchase_date", "yyyy-MM-dd")
    )


def read_json_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE ingest that splits (good_rows, quarantined_raw).

    The lake-scale alternative to FAILFAST: schema-conforming rows flow
    through; malformed records land, raw, in a quarantine frame keyed by
    ``_corrupt_record`` for offline repair — bad bytes never abort a
    100 TB backfill and never silently become nulls either.
    """
    with_corrupt = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("multiLine", multiline)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()  # Spark requires materialization before filtering on
        # _corrupt_record (SPARK-21610: raw-record queries alone are banned)
    )
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad
