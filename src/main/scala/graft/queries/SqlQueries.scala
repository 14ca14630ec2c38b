package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** The versioned store consumed the way the reference consumes its
  * warehouse — through SQL over named tables (the reference's entire
  * consumption surface is SQL: dags/SQL/DWH_Quality_Checks.sql,
  * dags/SQL/Gold/create_load_data_gold.sql): the
  * [[graft.sources.GraftCatalog]] V2 catalog + the
  * [[graft.sources.GraftRewrite]] native-scan rewrite +
  * the table_changes table-valued feed sugar, each hash-gated against
  * a DuckDB replay from the source table. */
object SqlQueries extends QueryPack {

  /** SQL over a versioned store: three key-ranged commits, then (a) a
    * range probe through `spark.sql` — planned by the analysis
    * rewrite as a native parquet scan whose file list the COMMIT
    * LOG's stats prune (SqlStoreSpec plan-asserts the 1-of-3 skip;
    * this gate pins the VALUES), and (b) a `VERSION AS OF 1` time-
    * travel read through the same SQL surface. The files_touched
    * evidence column is computed by the very [[graft.sources
    * .StatsSkipping]] evaluator the scan's file index runs, so a
    * broken skip fails the hash, not just a spec. */
  val storeSql = GQuery(
    "q_store_sql",
    (s, d) => {
      val root = graft.TempRoots.create("graft_sqlgate") + "/orders"
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      graft.ops.TableStore.append(
        src.where(col("o_orderkey") < 5000L).coalesce(1), root,
        statsCols = Seq("o_orderkey"))
      graft.ops.TableStore.append(
        src.where(col("o_orderkey") >= 5000L &&
          col("o_orderkey") < 10000L).coalesce(1), root,
        statsCols = Seq("o_orderkey"))
      graft.ops.TableStore.append(
        src.where(col("o_orderkey") >= 10000L).coalesce(1), root,
        statsCols = Seq("o_orderkey"))
      s.conf.set("spark.sql.catalog.gsql",
        classOf[graft.sources.GraftCatalog].getName)
      // the skip evidence, from the same evaluator the scan runs
      val live = graft.ops.TableStore.liveAt(s, root, 3L)
      val touched = graft.sources.StatsSkipping.prune(live, Seq(
        org.apache.spark.sql.sources.GreaterThanOrEqual("o_orderkey", 500L),
        org.apache.spark.sql.sources.LessThanOrEqual("o_orderkey", 1500L)))
      s.sql(s"""
        SELECT 'probe' AS leg, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_price,
               MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
               CAST(${touched.size} AS BIGINT) AS files_touched,
               CAST(${live.size} AS BIGINT) AS files_total
        FROM gsql.`$root`
        WHERE o_orderkey BETWEEN 500 AND 1500
        UNION ALL
        SELECT 'v1', COUNT(*),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
               MIN(o_orderkey), MAX(o_orderkey),
               CAST(${touched.size} AS BIGINT),
               CAST(${live.size} AS BIGINT)
        FROM gsql.`$root` VERSION AS OF 1
        ORDER BY leg""")
    },
    Some("""
      SELECT 'probe' AS leg, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price,
             MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
             CAST(1 AS BIGINT) AS files_touched,
             (SELECT CAST(1
                + CASE WHEN count(*) FILTER (WHERE o_orderkey >= 5000
                    AND o_orderkey < 10000) > 0 THEN 1 ELSE 0 END
                + CASE WHEN count(*) FILTER (WHERE o_orderkey >= 10000)
                    > 0 THEN 1 ELSE 0 END AS BIGINT)
              FROM orders) AS files_total
      FROM orders WHERE o_orderkey BETWEEN 500 AND 1500
      UNION ALL
      SELECT 'v1', COUNT(*),
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
             MIN(o_orderkey), MAX(o_orderkey),
             CAST(1 AS BIGINT),
             (SELECT CAST(1
                + CASE WHEN count(*) FILTER (WHERE o_orderkey >= 5000
                    AND o_orderkey < 10000) > 0 THEN 1 ELSE 0 END
                + CASE WHEN count(*) FILTER (WHERE o_orderkey >= 10000)
                    > 0 THEN 1 ELSE 0 END AS BIGINT)
              FROM orders)
      FROM orders WHERE o_orderkey < 5000
      ORDER BY leg
    """),
    eager = true)

  /** The row-level change feed on the SQL surface:
    * `table_changes(root, since[, to])` — the
    * [[graft.ops.TableStore.readRowChanges]] plumbing as a
    * table-valued function, so a CDC consumer is one SELECT, not an
    * API integration. Digests two windows ((1, 3] and (1, 2]) per
    * `_op`; the oracle restates both windows' inserts from the
    * source slices (append-only history: the feed is pure inserts,
    * and a delete leg appearing would break the hash). */
  val storeSqlChanges = GQuery(
    "q_store_sql_changes",
    (s, d) => {
      val root = graft.TempRoots.create("graft_sqlfeed") + "/orders"
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      graft.ops.TableStore.append(
        src.where(col("o_orderkey") < 5000L), root)
      graft.ops.TableStore.append(
        src.where(col("o_orderkey") >= 5000L &&
          col("o_orderkey") < 10000L), root)
      graft.ops.TableStore.append(
        src.where(col("o_orderkey") >= 10000L), root)
      s.sql(s"""
        SELECT 'w13' AS win, _op, COUNT(*) AS n_rows,
               SUM(o_orderkey) AS key_sum
        FROM table_changes('$root', 1)
        GROUP BY _op
        UNION ALL
        SELECT 'w12', _op, COUNT(*), SUM(o_orderkey)
        FROM table_changes('$root', 1, 2)
        GROUP BY _op
        ORDER BY win, _op""")
    },
    Some("""
      SELECT 'w13' AS win, 'insert' AS _op, COUNT(*) AS n_rows,
             CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM orders WHERE o_orderkey >= 5000
      UNION ALL
      SELECT 'w12', 'insert', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
      FROM orders WHERE o_orderkey >= 5000 AND o_orderkey < 10000
      ORDER BY win, _op
    """),
    eager = true)

  /** DML through the catalog ([[graft.sources.GraftWriteBuilder]]):
    * `INSERT INTO` appends one commit and `INSERT OVERWRITE` replaces
    * content as one commit — the SQL spellings of the very
    * append/overwrite commits the API takes, which is how the
    * reference loads its warehouse (dags/SQL/Bronze/
    * insert_data_into_bronze.sql — the entire ingest surface is
    * INSERT statements). The gate bootstraps v1 via the API, INSERTs
    * the rest of the table through SQL (in-body `require` pins one
    * commit per statement), then INSERT OVERWRITEs a slice and
    * digests BOTH the post-insert snapshot (`VERSION AS OF 2` — the
    * overwrite must not have touched it) and the overwritten latest.
    * The oracle restates both states from the source slices. */
  val storeSqlInsert = GQuery(
    "q_store_sql_insert",
    (s, d) => {
      val root = graft.TempRoots.create("graft_sqlins") + "/orders"
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      graft.ops.TableStore.append(
        src.where(col("o_orderkey") < 5000L), root)
      s.conf.set("spark.sql.catalog.gsqlw",
        classOf[graft.sources.GraftCatalog].getName)
      src.where(col("o_orderkey") >= 5000L)
        .createOrReplaceTempView("gate_sqlins_delta")
      s.sql(s"INSERT INTO gsqlw.`$root` " +
        "SELECT * FROM gate_sqlins_delta")
      require(graft.ops.TableStore.versions(s, root) == Seq(1L, 2L),
        "INSERT INTO must land as exactly one append commit")
      s.sql(s"INSERT OVERWRITE gsqlw.`$root` " +
        "SELECT * FROM gate_sqlins_delta WHERE o_orderkey >= 10000")
      require(graft.ops.TableStore.versions(s, root) ==
        Seq(1L, 2L, 3L),
        "INSERT OVERWRITE must land as exactly one rewrite commit")
      s.sql(s"""
        SELECT 'post_insert' AS leg, COUNT(*) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM gsqlw.`$root` VERSION AS OF 2
        UNION ALL
        SELECT 'post_overwrite', COUNT(*),
               CAST(SUM(o_orderkey) AS BIGINT)
        FROM gsqlw.`$root`
        ORDER BY leg""")
    },
    Some("""
      SELECT 'post_insert' AS leg, COUNT(*) AS n_rows,
             CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM orders
      UNION ALL
      SELECT 'post_overwrite', COUNT(*),
             CAST(SUM(o_orderkey) AS BIGINT)
      FROM orders WHERE o_orderkey >= 10000
      ORDER BY leg
    """),
    eager = true)

  override def all: Seq[GQuery] =
    Seq(storeSql, storeSqlChanges, storeSqlInsert)
}
