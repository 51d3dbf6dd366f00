package graft.operators

import graft.SparkTestBase

/** Exact violation counting per declared contract. */
class ExpectationsSpec extends SparkTestBase {

  import spark.implicits._

  test("each check type counts its planted violations exactly") {
    val t = Seq((1L, Some("a"), 5.0, "X"), (2L, None, 500.0, "Y"),
      (2L, Some("c"), -1.0, "X")).toDF("id", "name", "v", "tag")
    val parent = Seq(1L).toDF("pid")
    val out = Expectations.run(Seq(
      Expectations.NotNull("nn", t, "name"),
      Expectations.UniqueKey("uk", t, Seq("id")),
      Expectations.InRange("rng", t, "v", 0.0, 100.0),
      Expectations.Accepted("acc", t, "tag", Seq("X")),
      Expectations.Ref("fk", t, "id", parent, "pid")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("nn") == ((3L, 1L, false)))   // one null name
    assert(out("uk") == ((3L, 1L, false)))   // id 2 twice -> 1 extra row
    assert(out("rng") == ((3L, 2L, false)))  // 500 and -1 out of range
    assert(out("acc") == ((3L, 1L, false)))  // one 'Y'
    assert(out("fk") == ((3L, 2L, false)))   // both id-2 rows dangle
  }

  test("a clean frame passes every check") {
    val t = Seq((1L, "a", 5.0), (2L, "b", 6.0)).toDF("id", "name", "v")
    val out = Expectations.run(Seq(
      Expectations.NotNull("nn", t, "name"),
      Expectations.UniqueKey("uk", t, Seq("id")),
      Expectations.InRange("rng", t, "v", 0.0, 10.0))).collect()
    assert(out.forall(_.getBoolean(3)))
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("UniqueKey: NULL key components are violations, not a group") {
    // one NULL id + one duplicate pair + one NULL component in a
    // composite key — a groupBy-only count would pass the single NULL
    val t = Seq((Some(1L), Some("a")), (None, Some("b")),
      (Some(2L), Some("c")), (Some(2L), Some("c")), (Some(3L), None))
      .toDF("id", "sub")
    val single = Expectations.run(Seq(
      Expectations.UniqueKey("uk", t, Seq("id")))).collect()(0)
    assert(single.getLong(1) == 5L)
    assert(single.getLong(2) == 2L && !single.getBoolean(3)) // NULL + dup
    val composite = Expectations.run(Seq(
      Expectations.UniqueKey("uk2", t, Seq("id", "sub")))).collect()(0)
    assert(composite.getLong(2) == 3L) // two NULL-component rows + dup
  }
}
