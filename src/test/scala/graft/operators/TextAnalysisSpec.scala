package graft.operators

import graft.SparkTestBase

/** Chunking and keyword-extraction semantics on hand-checked inputs. */
class TextAnalysisSpec extends SparkTestBase {

  test("surfaceGate ≡ langId ⋈ qualityScore (fused pass, identical values)") {
    // texts chosen to exercise every branch: clear-en, clear-de, tie →
    // first-language order, zero-hit → "und", empty text, punct-soup
    val docs = spark.createDataFrame(Seq(
      (1L, "the cat sat of the mat and it is a to in"),
      (2L, "der hund ist nicht mit und das ein"),
      (3L, "la la la"), // fr/es tie by hits → fixed order decides
      (4L, "zzz qqq xyzzy"),
      (5L, ""),
      (6L, "!!! ,,, ... ;;; ???"))).toDF("doc_id", "text")
    val fused = TextAnalysis.surfaceGate(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val lang = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
    val qual = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(fused.keySet == lang.keySet)
    for ((id, (pl, q)) <- fused) {
      assert(pl == lang(id), s"pred_lang diverges for doc $id")
      assert(q == qual(id), s"quality diverges for doc $id")
    }
  }

  test("chunk: stride windows with ragged tail; overlap carries shared tokens") {
    // 12 tokens, window 5, stride 4 -> starts 0,4,8: sizes 5,5,4
    val docs = spark.createDataFrame(Seq(
      (1L, (1 to 12).map(i => s"w$i").mkString(" ")),
      (2L, "solo"),
      (3L, ""))) // empty: no chunks
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, 5, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1L, 0L) -> 5L, (1L, 1L) -> 5L, (1L, 2L) -> 4L,
      (2L, 0L) -> 1L))
  }

  test("chunk: md5 digests the exact token slice (overlapping windows differ)") {
    val docs = spark.createDataFrame(Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f")))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.chunk(docs, 4, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3))
    val byDoc = rows.groupBy(_._1._1).view
      .mapValues(_.sortBy(_._1._2).map(_._2).toSeq).toMap
    assert(byDoc(1L) == byDoc(2L))          // identical docs, identical digests
    assert(byDoc(1L).distinct.size == byDoc(1L).size) // each window distinct
  }

  test("keywords: rare term outranks common term; k and tie order enforced") {
    // "zebra" appears in one doc (high idf), "common" in all (idf low)
    val docs = spark.createDataFrame(Seq(
      (1L, "common zebra zebra common apple"),
      (2L, "common banana common"),
      (3L, "common cherry")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.keywords(docs, 2).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getString(1)).toMap
    assert(out((1L, 1)) == "zebra")  // tf=2 × high idf
    assert(out((2L, 1)) == "banana")
    assert(out((3L, 1)) == "cherry")
    // "common" (df=3, idf=ln(4/4)=0 ⇒ score 0) never wins rank 1
    assert(!out.exists { case ((_, rnk), t) => rnk == 1 && t == "common" })
  }

  test("lmScore: gibberish scores far above the corpus median NLL") {
    import org.apache.spark.sql.functions._
    val real = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
    val gibberish = spark.createDataFrame(Seq(
      (900001L, "zqx vjq wqz xqj qzv jxq zvq qjx xzq qvj zxq jqz"))).toDF("doc_id", "text")
    val scored = TextAnalysis.lmScore(real.unionByName(gibberish))
    val gNll = scored.where(col("doc_id") === 900001L)
      .collect()(0).getDouble(2)
    val med = scored.where(col("doc_id") < 900000L)
      .agg(expr("percentile(nll, 0.5)")).collect()(0).getDouble(0)
    assert(gNll > med * 1.5, s"gibberish nll $gNll vs median $med")
    // model is alphabet-bounded: trigrams over [a-z0-9 ] only
    val badTri = TextAnalysis.lmScore(real) // smoke: deterministic re-run
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val again = TextAnalysis.lmScore(real)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(badTri == again)
  }

  test("heavyHitters: exact answer — equals the brute-force count filter") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
    val got = TextAnalysis.heavyHitters(docs, 0.03)
    val terms = docs.select(explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("term"))
    val n = terms.count()
    val brute = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 0.03 * n)
      .select(col("term"), col("cnt"),
        round(col("cnt").cast("double") / n.toDouble, 6).as("freq"))
    assert(got.count() > 0)
    assert(got.exceptAll(brute).count() == 0 && brute.exceptAll(got).count() == 0)
  }

  test("sliceEntropy: uniform distribution hits log2(n) bits exactly") {
    import spark.implicits._
    // 4 equally-frequent tokens -> H = 2 bits, TTR = 4/8
    val docs = Seq(("u", "aa bb cc dd aa bb cc dd"),
      ("v", "xx xx xx xx")).toDF("lang", "text")
    val got = TextAnalysis.sliceEntropy(docs, "lang").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("u") == ((8L, 4L, 0.5, 2.0)))
    // single-token slice: zero entropy, TTR 1/4
    assert(got("v") == ((4L, 1L, 0.25, 0.0)))
  }
}
