package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** SNAP amazon-meta stanza-format source.
  *
  * Reference: `parse_amazon_meta` (`Hybrid_Recom_vecdb.py:33-101`) — a
  * single-threaded generator over the `Id:/ASIN:/title:/group:/similar:/
  * categories:` block format, dropping records without asin or title
  * (`:46-47`). SURVEY S1-S5.
  *
  * Spark-first design: records are split *by the input format*, not by a
  * driver loop — `lineSep = "\nId:"` makes each stanza one "line", which
  * Hadoop's record reader handles correctly across file-split boundaries,
  * so an uncompressed 100 TB dump parses fully in parallel (gzip falls
  * back to one split per file, same as the reference's sequential read).
  * Stanza → record is a pure function ([[parseStanza]]), unit-testable
  * without Spark.
  */
object AmazonMetaParser {

  /** The reference's product record (SURVEY §1.1 / FIXTURES §1). */
  case class Product(asin: String, title: String, group: String,
                     categories: Seq[String], similar: Seq[String])

  /** Parse one stanza (text between `Id:` markers) into a Product.
    * None when the stanza lacks asin or title — the reference's emit-time
    * filter (`Hybrid_Recom_vecdb.py:46-47`). */
  def parseStanza(stanza: String): Option[Product] = {
    var asin, title, group = ""
    val categories = Seq.newBuilder[String]
    val similar = Seq.newBuilder[String]
    val lines = stanza.split("\n", -1)
    var i = 0
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.startsWith("ASIN:")) asin = line.substring(5).trim
      else if (line.startsWith("title:")) title = line.substring(6).trim
      else if (line.startsWith("group:")) group = line.substring(6).trim
      else if (line.startsWith("similar:")) {
        // "similar: N a1 a2 ..." — drop the first two tokens (:93-98)
        val toks = line.split("\\s+").toSeq
        if (toks.length > 2) similar ++= toks.drop(2)
      } else if (line.startsWith("categories:")) {
        // "categories: N" followed by N raw category lines (:82-91)
        val n = line.substring(11).trim
        val cnt = if (n.nonEmpty && n.forall(_.isDigit)) n.toInt else 0
        var j = 0
        while (j < cnt && i + 1 < lines.length) {
          i += 1; j += 1
          val c = lines(i).trim
          if (c.nonEmpty) categories += c
        }
      }
      i += 1
    }
    if (asin.nonEmpty && title.nonEmpty)
      Some(Product(asin, title, group, categories.result(), similar.result()))
    else None
  }

  /** Read + parse a (possibly .gz) amazon-meta dump into a typed Dataset.
    *
    * Uses Hadoop's record reader with `textinputformat.record.delimiter =
    * "\nId:"` rather than the DataFrame text source: the text source
    * decodes UTF-8 only (its `encoding` option is not honored, and the
    * dump is ISO-8859-1 — `Hybrid_Recom_vecdb.py:31`), while the Hadoop
    * path hands back raw bytes that we decode explicitly. Record splitting
    * is handled by the reader across file-split boundaries, so an
    * uncompressed 100 TB dump parses fully in parallel; gzip falls back to
    * one split per file, same as the reference's sequential read. */
  def parse(spark: SparkSession, path: String): Dataset[Product] = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\nId:")
    val stanzas = spark.sparkContext.newAPIHadoopFile(path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text], conf)
      // Text buffers are reused by the reader — decode before the row
      // leaves the iterator.
      .map { case (_, t) =>
        new String(t.getBytes, 0, t.getLength,
          java.nio.charset.StandardCharsets.ISO_8859_1)
      }
    spark.createDataset(stanzas).flatMap(s => parseStanza(s))
  }

  def parseToDf(spark: SparkSession, path: String): DataFrame =
    parse(spark, path).toDF()
}
