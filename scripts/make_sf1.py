"""Synthesize an sf1 dataset (~6M lineitem) for the scale rehearsal by
upsampling the driver's read-only sf0.1 tables 10x.

/root/testdata is read-only, so the output lands in a scratch dir
(default /root/repo/.scratch/sf1 — gitignored). Design choices that
keep the 0.1 -> 1 scaling REALISTIC rather than degenerate:

- **Fact/dim keys offset per replica** (orderkey, custkey, partkey,
  suppkey, doc_id, vec_id, event_id, user_id) so referential integrity
  holds and join fan-outs scale linearly, exactly as TPC-H scaling does
  (customers grow with sf). region/nation stay fixed (they are fixed in
  TPC-H too).
- **Documents get a per-replica token suffix** ("tok" -> "tok_r3"):
  replica vocabularies are disjoint, so near-dup STRUCTURE within each
  replica matches sf0.1 and total LSH pair output grows ~10x (linear —
  the real growing-corpus model). Naive replication would make every
  doc a 10-way exact duplicate and blow the pair count up ~100x, a
  skew artifact no real corpus has.
- **Embeddings perturb one coordinate per replica** (tiny deterministic
  offset) so replicas are not bit-identical (no artificial distance
  ties), while the distribution stays the same.
- **Events keep their time range** (more events per window at higher
  sf — the stream-densification model) with offset user/event ids.

Deterministic: pure column arithmetic on the seeded source tables.
Usage: python scripts/make_sf1.py [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

# max key + 1 at sf0.1 — offsets stride by these
STRIDE = {
    "orderkey": 150_000,
    "custkey": 15_000,
    "partkey": 20_000,
    "suppkey": 1_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    """Cross with replica ids 0..factor-1 (broadcast literal array —
    narrow 10x expansion, no shuffle)."""
    return df.withColumn(
        "__rep", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )


def _shift(col: str, stride_key: str):
    return (F.col(col) + F.col("__rep") * STRIDE[stride_key]).alias(col)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("make_sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def read(t: str) -> DataFrame:
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    def write(df: DataFrame, t: str, parts: int) -> None:
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: {spark.read.parquet(f'{out}/{t}.parquet').count()} rows")

    # fixed dims — copied verbatim
    for t in ("region", "nation"):
        write(read(t), t, 1)

    c = _replicate(read("customer"), factor)
    write(
        c.select(
            _shift("c_custkey", "custkey"),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        ),
        "customer", 4,
    )

    s = _replicate(read("supplier"), factor)
    write(
        s.select(_shift("s_suppkey", "suppkey"), "s_name", "s_nationkey", "s_acctbal"),
        "supplier", 1,
    )

    p = _replicate(read("part"), factor)
    write(
        p.select(
            _shift("p_partkey", "partkey"),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        ),
        "part", 4,
    )

    o = _replicate(read("orders"), factor)
    write(
        o.select(
            _shift("o_orderkey", "orderkey"),
            _shift("o_custkey", "custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        "orders", 8,
    )

    li = _replicate(read("lineitem"), factor)
    write(
        li.select(
            _shift("l_orderkey", "orderkey"),
            _shift("l_partkey", "partkey"),
            _shift("l_suppkey", "suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        "lineitem", 16,
    )

    ev = _replicate(read("events"), factor)
    write(
        ev.select(
            _shift("event_id", "event_id"),
            "ts",
            _shift("user_id", "user_id"),
            "event_type", "value", "props",
        ),
        "events", 8,
    )

    d = _replicate(read("documents"), factor)
    suffixed = F.when(F.col("__rep") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split("text", " "),
                lambda t: F.concat(t, F.lit("_r"), F.col("__rep").cast("string")),
            ),
            " ",
        )
    )
    write(
        d.select(
            _shift("doc_id", "doc_id"),
            suffixed.alias("text"),
            "lang", "source",
            F.length(suffixed).cast("int").alias("n_chars"),
        ),
        "documents", 8,
    )

    e = _replicate(read("embeddings"), factor)
    perturbed = F.concat(
        F.array((F.element_at("embedding", 1) + F.col("__rep") * F.lit(1e-4)).cast("float")),
        F.slice("embedding", 2, 10_000),
    )
    write(
        e.select(
            _shift("vec_id", "vec_id"),
            perturbed.alias("embedding"),
            "label",
        ),
        "embeddings", 2,
    )

    spark.stop()


if __name__ == "__main__":
    main()
