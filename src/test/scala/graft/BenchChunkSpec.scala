package graft

import org.scalatest.funsuite.AnyFunSuite

/** Topology-aware bench chunking: every query exactly once, chunk size
  * bounded, at most one heavy query per chunk and always in last
  * position — the r7 lesson that a chunk's LAST query absorbs the JVM
  * context of everything before it (q167 10.9 s after three iterative
  * heavies vs 2.56 s truly alone). */
class BenchChunkSpec extends AnyFunSuite {

  private val heavies = Seq("q63_pagerank", "q94_pagerank_directed",
    "q149_ppr", "q163_label_prop", "q165_user_knn", "q167_freq_triples")

  test("chunks cover every query exactly once, bounded by chunk size") {
    val names = ((1 to 40).map(i => f"q$i%03d_light") ++ heavies).sorted
    val chunks = Bench.topoChunks(names, 10)
    assert(chunks.flatten.sorted == names.sorted)
    assert(chunks.forall(_.size <= 10))
  }

  test("at most one heavy per chunk, always last") {
    val names = ((1 to 40).map(i => f"q$i%03d_light") ++ heavies).sorted
    val chunks = Bench.topoChunks(names, 10)
    for (c <- chunks) {
      val h = c.filter(heavies.contains)
      assert(h.size <= 1, s"chunk $c has ${h.size} heavies")
      if (h.nonEmpty) assert(c.last == h.head, s"heavy not last in $c")
    }
  }

  test("more heavies than light groups -> extras run solo") {
    val names = (Seq("q01_a", "q02_b") ++ heavies).sorted
    val chunks = Bench.topoChunks(names, 3)
    assert(chunks.flatten.sorted == names.sorted)
    // 2 lights -> 1 group of 2, first heavy appended; other 5 solo
    assert(chunks.count(_.size == 1) >= heavies.size - 1)
  }

  test("all-heavy input -> one chunk per query") {
    val chunks = Bench.topoChunks(heavies, 10)
    assert(chunks == heavies.map(Seq(_)))
  }
}
