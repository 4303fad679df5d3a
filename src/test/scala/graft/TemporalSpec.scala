package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** As-of join semantics: inclusive match, latest-prior selection, NULL
  * payload when nothing precedes, same-row payload consistency, NULL keys
  * never matching. */
class TemporalSpec extends SparkTestBase {

  test("asofJoin picks the latest right row at-or-before each left row") {
    val s = spark; import s.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L), (4L, "u3", 10L))
      .toDF("id", "k", "t")
    val right = Seq(("u1", 100L, "a"), ("u1", 200L, "b"), ("u2", 60L, "c"))
      .toDF("k", "rt", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .orderBy("id").collect()
    // id 1: rt==t inclusive -> "a"; id 2: latest prior -> "b";
    // id 3: right at 60 > 50 -> null; id 4: no right rows for u3 -> null
    assert(out.map(r => (r.getLong(0), if (r.isNullAt(4)) null else r.getString(4))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, null), (4L, null)))
    // payload fields come from the SAME matched row
    assert(out(1).getLong(3) == 200L && out(1).getString(4) == "b")
  }

  test("asofJoin: NULL keys never match; result rows == left rows") {
    val s = spark; import s.implicits._
    val left = Seq((1L, null.asInstanceOf[String], 100L), (2L, "u1", 100L))
      .toDF("id", "k", "t")
    val right = Seq((null.asInstanceOf[String], 10L, "x"), ("u1", 10L, "y"))
      .toDF("k", "rt", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(3), "null-key left row must not match the null-key right row")
    assert(out(1).getString(3) == "y")
  }

  test("intervalJoin equals the naive theta-join for every block size") {
    val s = spark; import s.implicits._
    // intervals of varying span (some spanning many blocks, some empty,
    // one inverted — dropped), points on and off boundaries
    val points = (0 to 300).map(i => (i.toLong, s"k${i % 5}", i.toLong * 7)).toDF("pid", "k", "t")
    val intervals = Seq(
      (1L, "k0", 0L, 100L), (2L, "k0", 100L, 101L), (3L, "k1", 50L, 1050L),
      (4L, "k2", 2000L, 2100L), (5L, "k3", 10L, 10L), (6L, "k4", 90L, 80L),
      (7L, "k0", 95L, 2101L)).toDF("iid", "k", "s", "e")
    val naive = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") && col("p.t") >= col("s") && col("p.t") < col("e"))
      .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bs <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      val got = Temporal.intervalJoin(points, intervals, Seq("k"), "t", "s", "e",
          Seq("iid"), blockSize = bs)
        .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"blockSize=$bs")
    }
  }

  test("asofJoin ties at equal (key, ts) resolve by payload-struct order") {
    val s = spark; import s.implicits._
    val left = Seq((1L, "u1", 100L)).toDF("id", "k", "t")
    // three right rows at the identical (key, ts): the LAST in
    // payload-struct order must win, independent of partition layout
    val dup = Seq(("u1", 100L, "a"), ("u1", 100L, "z"), ("u1", 100L, "m"))
    for (seed <- 1 to 4) {
      val right = s.createDataFrame(
        s.sparkContext.parallelize(scala.util.Random.shuffle(dup), 3))
        .toDF("k", "rt", "v").repartition(3).orderBy(rand(seed))
      val out = Temporal.asofJoin(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
        .collect()
      assert(out.length == 1 && out(0).getString(4) == "z", s"seed=$seed")
    }
  }

  test("asofJoin survives a shuffled, multi-partition input identically") {
    val s = spark; import s.implicits._
    val left = (1 to 200).map(i => (i.toLong, s"u${i % 7}", i.toLong * 10)).toDF("id", "k", "t")
    val right = (1 to 50).map(j => (s"u${j % 7}", j.toLong * 37, j.toLong)).toDF("k", "rt", "v")
    val expected = Temporal.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("id").collect().toSeq
    val shuffled = Temporal.asofJoin(
      left.repartition(7).orderBy(rand(3)), right.repartition(5).orderBy(rand(4)),
      Seq("k"), "t", "rt", Seq("v")).orderBy("id").collect().toSeq
    assert(shuffled == expected)
  }
}
