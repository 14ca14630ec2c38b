package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.TableStore

/** The versioned store as a streaming SOURCE
  * ([[graft.sources.GraftStreamSource]]): commits become micro-batch
  * offsets behind Spark's own checkpoint machinery — tick
  * equivalence against the batch change feed, exactly-once replay
  * through a real checkpoint, rate-limited catch-up, and the loud
  * rewrite contract. */
class StoreStreamSourceSpec extends SparkSpec {

  private def base() = graft.TempRoots.create("graft_ssrc")

  private def mk(ids: Seq[Long]) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, s"r$i")).toDF("id", "payload")
  }

  /** Drain the store stream through foreachBatch (AvailableNow; a
    * checkpoint-recoverable sink, unlike memory) and return the rows
    * this RUN delivered as (id, payload, _commit_version). */
  private def drain(root: String, ckpt: String, tag: String,
                    options: Map[String, String] = Map.empty)
      : Seq[(Long, String, Long)] = {
    var reader = spark.readStream.format("graft")
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]
    val q = reader.load(root).writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach(r => got.add((r.getLong(0), r.getString(1),
          r.getAs[Long]("_commit_version"))))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    got.toArray(Array.empty[(Long, String, Long)]).toSeq
  }

  test("stream over N commits is tick-equivalent to the batch feed") {
    val b = base(); val root = s"$b/t"
    TableStore.append(mk(1L to 3L), root)  // v1
    TableStore.append(mk(4L to 6L), root)  // v2
    TableStore.append(mk(7L to 9L), root)  // v3
    val got = drain(root, s"$b/ckpt_eq", "eq",
      Map("maxVersionsPerBatch" -> "1")).toSet
    val feed = TableStore.readChangesSince(spark, root, 0L, Some(3L))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Long]("_commit_version"))).toSet
    assert(got == feed)
    // the cap paced catch-up one commit per batch: every version is
    // a distinct provenance value and all three arrived
    assert(got.map(_._3) == Set(1L, 2L, 3L) &&
      got.map(_._1) == (1L to 9L).toSet)
  }

  test("maxRowsPerBatch bounds batches across skewed commit sizes; " +
      "tick equivalence preserved") {
    val b = base(); val root = s"$b/t"
    TableStore.append(mk(1L to 2L), root)   // v1: 2 rows
    TableStore.append(mk(3L to 5L), root)   // v2: 3 rows
    TableStore.append(mk(6L to 15L), root)  // v3: 10 rows (fat commit)
    TableStore.append(mk(16L to 16L), root) // v4: 1 row
    TableStore.append(mk(17L to 17L), root) // v5: 1 row
    // capture (batchId -> versions) to assert batch COMPOSITION
    val batches = new java.util.concurrent.ConcurrentHashMap[Long, Set[Long]]
    var reader = spark.readStream.format("graft")
      .option("maxRowsPerBatch", "5")
    val q = reader.load(root).writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        batches.put(id, df.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).toSet)
        ()
      }
      .option("checkpointLocation", s"$b/ckpt_rows")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val byBatch = batches.asScala.toSeq.sortBy(_._1).map(_._2)
    // v1+v2 fit the 5-row budget; the 10-row v3 exceeds it but lands
    // WHOLE as its own batch (commits are the atom); v4+v5 follow
    assert(byBatch == Seq(Set(1L, 2L), Set(3L), Set(4L, 5L)),
      s"batch composition: $byBatch")
    // tick equivalence: the union is exactly the batch feed
    assert(byBatch.flatten.toSet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("rows-feed admission charges REMOVED rows too, not just adds") {
    val b = base(); val root = s"$b/t"
    TableStore.append(mk(1L to 5L), root)    // v1: 5 rows
    TableStore.overwrite(mk(6L to 7L), root) // v2: removes 5, adds 2
    // rows-feed emits v2 as 2 inserts + 5 deletes = 7 rows; a cap of
    // 7 must NOT batch v1 (5 rows) with v2 — adds-only accounting
    // (5 + 2 = 7) would
    val batches = new java.util.concurrent.ConcurrentHashMap[Long, Long]
    val q = spark.readStream.format("graft")
      .option("feed", "rows").option("maxRowsPerBatch", "7")
      .load(root).writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        batches.put(id, df.count()); ()
      }
      .option("checkpointLocation", s"$b/ckpt_rowscap")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val sizes = batches.asScala.toSeq.sortBy(_._1).map(_._2)
    // batch 0 = v1's 5 inserts; batch 1 = v2's net delta (the rows
    // feed cancels moved rows: 5 deletes + 2 inserts net)
    assert(sizes.size == 2, s"v2 must land as its own batch: $sizes")
    assert(sizes.head == 5L, s"batch sizes: $sizes")
  }

  test("exactly-once replay through a real checkpoint") {
    val b = base(); val root = s"$b/t"
    val ckpt = s"$b/ckpt_once"
    TableStore.append(mk(1L to 3L), root)  // v1
    TableStore.append(mk(4L to 5L), root)  // v2
    val first = drain(root, ckpt, "once1").map(_._1).toSet
    assert(first == (1L to 5L).toSet)
    // new commits land; the restarted query (SAME checkpoint) must
    // see exactly them — no replays, no losses
    TableStore.append(mk(6L to 7L), root)  // v3
    TableStore.append(mk(8L to 8L), root)  // v4
    val second = drain(root, ckpt, "once2")
      .map(r => (r._1, r._3)).toSet
    assert(second == Set((6L, 3L), (7L, 3L), (8L, 4L)))
    // nothing new: a third restart drains zero batches
    assert(drain(root, ckpt, "once3").isEmpty)
  }

  test("startingVersion skips history; layout commits are invisible") {
    val b = base(); val root = s"$b/t"
    TableStore.append(mk(1L to 3L), root)          // v1 — history
    TableStore.append(mk(4L to 5L), root)          // v2
    TableStore.compact(spark, root, 1L << 30)      // v3 — layout
    TableStore.append(mk(6L to 6L), root)          // v4
    val got = drain(root, s"$b/ckpt_sv", "sv",
      Map("startingVersion" -> "1")).map(r => (r._1, r._3)).toSet
    // v1 skipped (history), v3 contributed nothing (rewrote content
    // it didn't change), v2 + v4 arrived once each
    assert(got == Set((4L, 2L), (5L, 2L), (6L, 4L)))
  }

  test("writeStream.format(graft): exactly-once sink; store-to-store pipe") {
    val b = base(); val src = s"$b/src"; val out = s"$b/out"
    val ckpt = s"$b/ckpt_pipe"
    TableStore.append(mk(1L to 3L), src)  // v1
    TableStore.append(mk(4L to 5L), src)  // v2
    def pipe(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .option("statsCols", "id")
        .trigger(Trigger.AvailableNow()).start(out)
      q.awaitTermination()
    }
    pipe()
    def outIds: Set[Long] = TableStore.read(spark, out)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(outIds == (1L to 5L).toSet)
    val vAfter = TableStore.versions(spark, out).size
    // statsCols rode the sink option into the commit log
    assert(TableStore.liveAt(spark, out,
      TableStore.versions(spark, out).last).forall(_.mins.contains("id")))
    // checkpoint replay: a restart with nothing new commits nothing
    pipe()
    assert(TableStore.versions(spark, out).size == vAfter)
    // new source commits flow through exactly once
    TableStore.append(mk(6L to 6L), src)  // v3
    pipe()
    assert(outIds == (1L to 6L).toSet)
    assert(TableStore.read(spark, out).count() == 6L) // no duplicates
    // the sink is append-only by contract
    val ex = intercept[Exception] {
      spark.readStream.format("graft").load(src)
        .groupBy("payload").count()
        .writeStream.format("graft").outputMode("complete")
        .option("checkpointLocation", s"$b/ckpt_bad")
        .trigger(Trigger.AvailableNow()).start(s"$b/bad")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("append-only")))
  }

  test("feed=rows: the CDC stream survives rewrites, emitting _op rows") {
    val b = base(); val root = s"$b/t"; val ckpt = s"$b/ckpt_rows"
    TableStore.append(mk(1L to 3L), root) // v1
    def drainRows(): Set[(Long, String, Long)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]
      val q = spark.readStream.format("graft").option("feed", "rows")
        .load(root).writeStream
        .foreachBatch { (bdf: DataFrame, _: Long) =>
          bdf.collect().foreach(r => got.add((r.getLong(0),
            r.getAs[String]("_op"), r.getAs[Long]("_commit_version"))))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.toArray(Array.empty[(Long, String, Long)]).toSet
    }
    assert(drainRows() ==
      Set((1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 1L)))
    // a REWRITE — the appends feed would fail loudly here; the rows
    // feed emits the NET delta: ids 1,2 deleted, 4 inserted, 3
    // unchanged (identical row on both sides of the diff cancels)
    TableStore.overwrite(mk(3L to 4L), root) // v2
    assert(drainRows() ==
      Set((1L, "delete", 2L), (2L, "delete", 2L), (4L, "insert", 2L)))
    // nothing new: an idle restart emits nothing
    assert(drainRows().isEmpty)
  }

  test("a content rewrite inside the stream window fails loudly") {
    val b = base(); val root = s"$b/t"
    TableStore.append(mk(1L to 3L), root) // v1
    TableStore.overwrite(mk(9L to 9L), root) // v2 — rewrite
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(root, s"$b/ckpt_rw", "rw")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("rewrote content")))
  }
}
