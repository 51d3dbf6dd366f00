package graft.sources

import graft.sources.AmazonMetaParser._
import org.scalatest.funsuite.AnyFunSuite

/** Stanza-parser edge cases from FIXTURES.md §1 (reference behaviors at
  * /root/reference/Hybrid_Recom_vecdb.py:33-101). Pure function — no
  * Spark session needed. */
class AmazonMetaParserSpec extends AnyFunSuite {

  private val full =
    """Id:   15
      |ASIN: 1559362022
      |  title: Wake Up and Smell the Coffee
      |  group: Book
      |  similar: 5 1559360968 1559361247 1559360828 B0000A2H4N 0743214552
      |  categories: 2
      |   |Books[283155]|Subjects[1000]|Literature & Fiction[17]
      |   |Books[283155]|Subjects[1000]|Arts[1]""".stripMargin

  test("full stanza parses every field") {
    val p = parseStanza(full).get
    assert(p.asin == "1559362022")
    assert(p.title == "Wake Up and Smell the Coffee")
    assert(p.group == "Book")
    assert(p.similar == Seq("1559360968", "1559361247", "1559360828", "B0000A2H4N", "0743214552"))
    assert(p.categories.size == 2)
    assert(p.categories.head.startsWith("|Books[283155]"))
  }

  test("missing title drops the record (ref :46-47)") {
    assert(parseStanza("Id: 1\nASIN: X1\n  group: Book").isEmpty)
  }

  test("missing asin drops the record") {
    assert(parseStanza("Id: 1\n  title: T\n  group: Book").isEmpty)
  }

  test("categories: 0 yields empty array (ref :84)") {
    val p = parseStanza("Id: 1\nASIN: X\n  title: T\n  categories: 0").get
    assert(p.categories.isEmpty)
  }

  test("similar with fewer than 3 tokens yields empty list (ref :96)") {
    val p = parseStanza("Id: 1\nASIN: X\n  title: T\n  similar: 0").get
    assert(p.similar.isEmpty)
  }

  test("EOF mid-categories keeps what was read (ref :87-89)") {
    val p = parseStanza("Id: 1\nASIN: X\n  title: T\n  categories: 5\n   |A|B").get
    assert(p.categories == Seq("|A|B"))
  }

  test("category count lines are consumed, not parsed as fields") {
    // a category line containing "title:" must not overwrite the title
    val p = parseStanza(
      "Id: 1\nASIN: X\n  title: Real\n  categories: 1\n   title: fake|path").get
    assert(p.title == "Real")
    assert(p.categories == Seq("title: fake|path"))
  }

  test("discontinued products (no title/group/similar) are dropped") {
    assert(parseStanza("Id: 2\nASIN: 0738700797\n  discontinued product").isEmpty)
  }
}
