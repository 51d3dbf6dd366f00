package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Clustering-quality evaluation over an embedding column — the audit a
  * pipeline runs before trusting a partition of the corpus (IVF cells,
  * topic labels, dedup communities) for routing or stratified sampling.
  *
  * Centroid-form silhouette (the simplified silhouette of Hruschka et
  * al.; sklearn calls the full-pairwise form silhouette_score): per
  * point, a = distance to its OWN cluster prototype, b = distance to
  * the nearest OTHER prototype, s = (b − a)/max(a, b) ∈ [−1, 1].
  * Positive = the point sits closer to its own prototype than any
  * other; negative = it is mis-clustered. The full-pairwise silhouette
  * is O(n²) in data rows and can never ship at 100 TB; the centroid
  * form is the standard scale substitute — O(n·|clusters|) with a
  * broadcast prototype table, all map-side after one aggregate.
  */
object ClusterEval {

  /** Per-label prototype (element-wise mean) + every point's silhouette
    * against the prototype table, aggregated per label.
    *
    * Cross-engine determinism: prototype components round to 6 dp
    * BEFORE any distance (so both engines feed bit-identical centroids
    * into the per-row distance expression), each distance rounds to
    * 6 dp BEFORE the a/b min-compare (so the argmin and the silhouette
    * ratio consume identical doubles), and the per-label mean rounds at
    * 6 dp on output — the only order-dependent float fold left is the
    * final avg, at ~1e-13 relative error against a 1e-6 grid.
    *
    * Spark shape: one (label, pos) aggregate over the exploded vectors
    * (one shuffle), prototypes reassemble label-sized and BROADCAST to
    * a map-side per-point distance scan (|clusters| distances per row,
    * no shuffle), one per-label aggregate. The per-point frame never
    * carries a pairwise expansion.
    *
    * @param emb frame with an id, a label, and an embedding array column
    * @return (label, n, mean_sil) one row per label, mean_sil at 6 dp */
  def centroidSilhouette(emb: DataFrame, idCol: String, labelCol: String,
                         embCol: String): DataFrame = {
    val e = emb.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
      VectorFunctions.asDouble(col(embCol)).as("v"))
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x")).as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => round(s.getField("m"), 6)).as("centroid"))
    val dist = e.crossJoin(broadcast(
        cent.select(col("label").as("clabel"), col("centroid"))))
      .withColumn("d", round(sqrt(aggregate(
        zip_with(col("v"), col("centroid"), (x, c) => (x - c) * (x - c)),
        lit(0.0), _ + _)), 6))
    val per = dist.groupBy("vec_id", "label")
      .agg(max(when(col("clabel") === col("label"), col("d"))).as("a"),
        min(when(col("clabel") =!= col("label"), col("d"))).as("b"))
      .withColumn("sil",
        when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
    per.groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg(col("sil")), 6).as("mean_sil"))
  }
}
