"""The mandated deployment shape: Spark SQL reading Hive-metastore tables.

``spark.sql.catalogImplementation`` is fixed for the JVM's lifetime and the
shared test session is in-memory, so the Hive path runs in a subprocess:
embedded derby metastore + external parquet tables + a managed
``saveAsTable`` round-trip.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from hive_feature_demo_spark.session import get_spark
from hive_feature_demo_spark.catalog import register_hive_tables

spark = get_spark(app_name="hive-test", hive=True, warehouse_dir={wh!r},
                  shuffle_partitions=4)
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

register_hive_tables(spark, sf_dir={sf!r}, database="star")
n = spark.sql("SELECT COUNT(*) AS n FROM star.nation").collect()[0]["n"]
assert n == 25, n

# metastore-backed join across external tables
rows = spark.sql(
    "SELECT r.r_name, COUNT(*) AS n FROM star.nation nt "
    "JOIN star.region r ON nt.n_regionkey = r.r_regionkey "
    "GROUP BY r.r_name ORDER BY r.r_name"
).collect()
assert len(rows) == 5, rows

# CBO statistics: ANALYZE populates rowCount the optimizer consumes
from hive_feature_demo_spark.catalog import analyze_tables
analyze_tables(spark, "star", columns={{"nation": ["n_nationkey", "n_name"]}})
desc = spark.sql("DESCRIBE TABLE EXTENDED star.nation").collect()
stats_row = [r for r in desc if r["col_name"] == "Statistics"]
assert stats_row and "rows" in stats_row[0]["data_type"], desc

# nano-timestamp table: both registration paths expose ts as TIMESTAMP
ts_type = dict(spark.table("star.events").dtypes)["ts"]
assert ts_type == "timestamp", ts_type
n_win = spark.sql(
    "SELECT COUNT(*) AS n FROM (SELECT window(ts, '1 hour') FROM star.events)"
).collect()[0]["n"]
assert n_win > 0

# managed-table round trip (write through the metastore, read back)
spark.sql("DROP TABLE IF EXISTS star.campaigns_t")
spark.createDataFrame(
    [("c1", "seg1")], "campaign_id string, segment_id string"
).write.saveAsTable("star.campaigns_t")
assert spark.table("star.campaigns_t").count() == 1
assert any(t.name == "campaigns_t" for t in spark.catalog.listTables("star"))
print("HIVE_OK")
"""


def test_hive_metastore_roundtrip(tmp_path, sf_dir):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, wh=str(tmp_path / "wh"), sf=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "HIVE_OK" in proc.stdout
