package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: does an eager `localCheckpoint` fire `observe` metrics?
  * (If yes, iterative loops can harvest per-round scalars from the
  * checkpoint action they already pay for, instead of a separate
  * aggregate job + broadcast.) Usage: runMain graft.ObsProbe */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val obs = Observation("probe")
    val df = (1 to 100).toDF("x")
      .observe(obs, sum(col("x")).as("sx"))
      .localCheckpoint()
    // if the checkpoint action fired the metric, get returns immediately;
    // probe with a bounded wait so a non-firing action can't hang us
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val got = try Some(Await.result(Future(obs.get), 10.seconds))
              catch { case _: Throwable => None }
    println(s"[obsprobe] after localCheckpoint: $got")
    df.count()
    spark.stop()
  }
}
