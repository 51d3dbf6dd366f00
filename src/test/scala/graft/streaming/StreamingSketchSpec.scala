package graft.streaming

import graft.SparkTestBase
import graft.operators.Sketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming sketch maintenance: micro-batches fold into a persistent
  * HLL register table via foreachBatch + the merge law (union → max per
  * register) — the continuous "distinct users so far" counter a 100 TB
  * ingest keeps without ever storing or shuffling the raw key set.
  * The END state must equal the batch sketch of all data — the merge
  * law proven in motion, not just on static shards (SketchSpec). */
class StreamingSketchSpec extends SparkTestBase {

  test("foreachBatch-merged HLL registers equal the batch sketch exactly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // mutable register store a production job would keep in a table;
    // merged under foreachBatch's serial contract
    var store: DataFrame = Seq.empty[(String, Long, Int)]
      .toDF("tag", "bucket", "reg")

    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("k")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store = Sketch.hllMerge(store, Sketch.hllRegisters(batch, Seq("k")))
          .localCheckpoint()
        ()
      }
      .start()
    try {
      mem.addData((1 to 400).map(i => s"u$i"): _*)
      q.processAllAvailable()
      // second batch overlaps the first — set semantics must hold
      mem.addData((200 to 700).map(i => s"u$i"): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = Sketch.hllEstimate(store).collect()(0)
    val batch = Sketch.hllDistinct(
      (1 to 700).map(i => s"u$i").toDF("k"), Seq("k")).collect()(0)
    assert(streamed.getAs[Long]("z_scaled") == batch.getAs[Long]("z_scaled"))
    assert(streamed.getAs[Double]("est_distinct") ==
      batch.getAs[Double]("est_distinct"))
    // and the estimate is actually useful: within 10% of 700 true keys
    assert(math.abs(streamed.getAs[Double]("est_distinct") - 700) < 70)
  }
}
