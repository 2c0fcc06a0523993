package graft

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("phrase hits with overlap: 'a a' in 'a a a' matches twice") {
    val docs = Seq((1L, "a a a"), (2L, "a b a"), (3L, "b a a b")).toDF("id", "text")
    val rows = Retrieval.phraseSearch(docs, "id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 2L, 1L), (3L, 1L, 2L)))
  }

  test("three-word phrase chains two joins and respects order") {
    val docs = Seq((1L, "x y z"), (2L, "z y x"), (3L, "w x y z q x y z")).toDF("id", "text")
    val rows = Retrieval.phraseSearch(docs, "id", "text", Seq("x", "y", "z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 1L, 1L), (3L, 2L, 2L)))
  }

  test("absent phrase returns no rows") {
    val docs = Seq((1L, "x y z")).toDF("id", "text")
    assert(Retrieval.phraseSearch(docs, "id", "text", Seq("q", "r")).count() == 0L)
  }
}
