package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.Validate

/** Window family — SURVEY.md §2.5 W1/W2/W3, §2.6 O1-O3.
  *
  * Scale notes: W1/W2 windows are partitioned by a key → hash shuffle,
  * parallel per key group, no global sort. Only the surrogate-key
  * window (W3) is a single-partition global order — bounded by DIM
  * cardinality (segments/priorities), never by fact rows; at 100 TB a
  * dim of a few thousand values is still a one-task window. Fact-side
  * surrogate keys at scale should switch to xxhash64 of the natural
  * key (stable, shuffle-free) — SURVEY.md §7.5.
  */
object WindowQueries extends QueryPack {

  /** W1: duplicate marking, ALL copies flagged (pandas
    * duplicated(keep=False) semantics). */
  val dupWindowMark = GQuery(
    "q_dup_window_mark",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        Validate.duplicatedAll(col("o_custkey")).cast("int").as("is_dup"))
      .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, o_custkey,
             CAST(o_custkey IS NOT NULL
                  AND COUNT(*) OVER (PARTITION BY o_custkey) > 1 AS INTEGER) AS is_dup
      FROM orders ORDER BY o_orderkey
    """))

  /** W2: latest-record-per-key via row_number with a deterministic
    * tiebreak (reference: ORDER BY created_at DESC LIMIT 1 per key,
    * dags/DataWarehouse.py:91-99). */
  val latestPerKey = GQuery(
    "q_latest_per_key",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("latest_order_date"))
        .orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) AS latest_order_date
      FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1 ORDER BY o_custkey
    """))

  /** W3: dense surrogate keys over a distinct dim (SERIAL semantics —
    * stable because the ordering key is total). */
  val surrogateKeys = GQuery(
    "q_surrogate_keys",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderpriority")).distinct()
      .withColumn("priority_key",
        row_number().over(Window.orderBy(col("o_orderpriority"))))
      .orderBy("priority_key"),
    Some("""
      SELECT o_orderpriority,
             ROW_NUMBER() OVER (ORDER BY o_orderpriority) AS priority_key
      FROM (SELECT DISTINCT o_orderpriority FROM orders)
      ORDER BY priority_key
    """))

  /** O1+O3: ordered top-k (TakeOrderedAndProject — no full sort at
    * scale, each partition keeps k rows then the driver merges k). */
  val topkOrders = GQuery(
    "q_topk_orders",
    (s, d) => Tables.orders(s, d)
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice")),
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """))

  def all: Seq[GQuery] =
    Seq(dupWindowMark, latestPerKey, surrogateKeys, topkOrders)
}
