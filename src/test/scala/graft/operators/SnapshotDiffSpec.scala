package graft.operators

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies every key; full-outer keeps both sides") {
    val old = Seq((1L, "s1", "a"), (2L, "s1", "b"), (3L, "s2", "c"))
      .toDF("k", "src", "fp")
    val neu = Seq((2L, "s1", "b"), (3L, "s2", "CHANGED"), (4L, "s2", "d"))
      .toDF("k", "src", "fp")
    val out = SnapshotDiff.diff(old, neu, "k", "src", "fp")
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[String]("src"), r.getAs[String]("status")))).toMap
    assert(out == Map(
      1L -> (("s1", "removed")),
      2L -> (("s1", "unchanged")),
      3L -> (("s2", "changed")),
      4L -> (("s2", "added"))))
  }

  test("diffSummary rolls up per (group, status)") {
    val old = (1L to 10L).map(i => (i, "g", s"fp$i")).toDF("k", "src", "fp")
    val neu = ((3L to 12L).map(i =>
      (i, "g", if (i % 3 == 0) s"fp$i'" else s"fp$i"))).toDF("k", "src", "fp")
    val out = SnapshotDiff.diffSummary(old, neu, "k", "src", "fp")
      .collect().map(r => r.getAs[String]("status") -> r.getAs[Long]("n"))
      .toMap
    // old-only: 1,2; new-only: 11,12; changed: 3,6,9; unchanged: 4,5,7,8,10
    assert(out == Map("removed" -> 2L, "added" -> 2L, "changed" -> 3L,
      "unchanged" -> 5L))
  }
}
