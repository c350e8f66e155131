"""A/B the packed 16-agg simhash formulation vs the current one.

Verifies bit-identity via exceptAll both ways on sf0.01 documents, and
prints warm timings for both. Run fresh-session timings separately via
check_queries.py.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from hive_feature_demo_spark.session import get_spark  # noqa: E402
from hive_feature_demo_spark.operators.dedup import simhash64, tokens  # noqa: E402

#: packed[v] = Σ_{r<4} ((v>>r)&1) << (16r) — the 4 bit-indicators of
#: nibble value v, each in its own 16-bit count field of one long.
_PACKED = [
    sum(((v >> r) & 1) << (16 * r) for r in range(4)) for v in range(16)
]


def simhash64_packed(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn(
        "nibs",
        F.expr(
            "transform(sequence(1, 16),"
            " i -> instr('0123456789abcdef', substring(md5(tok), i, 1)) - 1)"
        ),
    )
    pk = "array(" + ",".join(f"{v}L" for v in _PACKED) + ")"
    aggs = [
        F.sum(F.expr(f"element_at({pk}, element_at(nibs, {i + 1}) + 1)")).alias(
            f"p_{i}"
        )
        for i in range(16)
    ] + [F.count(F.lit(1)).alias("n_tok")]
    sums = toks.groupBy(id_col).agg(*aggs)
    # bit j of nibble i set iff 2*count_field > n_tok (vote sum > 0)
    nib_hex = [
        F.expr(
            "substring('0123456789abcdef', CAST("
            + " + ".join(
                f"shiftleft(CASE WHEN 2 * ((p_{i} >> {16 * r}) & 65535)"
                f" > n_tok THEN 1 ELSE 0 END, {r})"
                for r in range(4)
            )
            + " AS INT) + 1, 1)"
        )
        for i in range(16)
    ]
    return sums.select(F.col(id_col), F.concat(*nib_hex).alias("simhash"))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    t0 = time.time()
    cur = simhash64(docs, "doc_id", "text").cache()
    n_cur = cur.count()
    t_cur = time.time() - t0

    t0 = time.time()
    new = simhash64_packed(docs, "doc_id", "text").cache()
    n_new = new.count()
    t_new = time.time() - t0

    d1 = cur.exceptAll(new).count()
    d2 = new.exceptAll(cur).count()
    print(
        f"rows cur={n_cur} new={n_new} diff={d1}/{d2}"
        f" time cur={t_cur:.2f}s new={t_new:.2f}s"
    )
    # warm second pass, uncached
    cur.unpersist(); new.unpersist()
    t0 = time.time(); simhash64(docs, "doc_id", "text").count(); w_cur = time.time() - t0
    t0 = time.time(); simhash64_packed(docs, "doc_id", "text").count(); w_new = time.time() - t0
    print(f"warm cur={w_cur:.2f}s new={w_new:.2f}s")
    assert d1 == 0 and d2 == 0, "MISMATCH"
    print("BIT-IDENTICAL")


if __name__ == "__main__":
    main()
