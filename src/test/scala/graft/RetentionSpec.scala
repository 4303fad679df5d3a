package graft

import org.apache.spark.sql.functions._
import graft.operators.Retention

/** R1 read-time retention over the FIXTURES.md retention/deletion corpora
  * (reference behavior: IndexReader.cs:226-330,
  * Core.Tests/Services/Storage/MaxAgeMaxCount/). */
class RetentionSpec extends SparkTestBase {

  private val asOf = ts("2024-01-10 00:00:00")

  // r-max3: 10 events, $maxCount=3 → reads return 7..9
  // r-age: 5 events, timestamps asOf-4d..asOf-0d, $maxAge=1 day → last 2
  // r-tb: 10 events, $tb=3 → 3..9
  // r-soft: $tb=MaxValue → NoStream; r-hard: tombstoned → StreamDeleted
  private lazy val log = envelope(
    (0L to 9L).map(i => ev("r-max3", i, "E", i)) ++
    (0L to 4L).map(i => ev("r-age", i, "E", 100 + i,
      timestamp = ts(f"2024-01-${6 + i}%02d 12:00:00"))) ++
    (0L to 9L).map(i => ev("r-tb", i, "E", 200 + i)) ++
    (0L to 2L).map(i => ev("r-soft", i, "E", 300 + i)) ++
    (0L to 2L).map(i => ev("r-hard", i, "E", 400 + i)) ++
    Seq(ev("r-plain", 0, "E", 500))
  )

  private lazy val meta = {
    val s = spark
    import s.implicits._
    Seq(
      ("r-max3", Some(3L), Option.empty[Long], Option.empty[Long], false),
      ("r-age", None, Some(86400L), None, false),
      ("r-tb", None, None, Some(3L), false),
      ("r-soft", None, None, Some(Long.MaxValue), false),
      ("r-hard", None, None, None, true)
    ).toDF("stream_id", "max_count", "max_age_sec", "truncate_before", "tombstoned")
  }

  private lazy val retained = Retention.applyRetention(log, meta, lit(asOf))

  private def numbers(stream: String): Seq[Long] =
    retained.where(col("stream_id") === stream)
      .select("event_number").collect().map(_.getLong(0)).sorted.toSeq

  test("maxCount keeps the last N events") { assert(numbers("r-max3") == Seq(7L, 8L, 9L)) }

  test("maxAge keeps events younger than the cutoff") {
    // asOf 01-10 00:00, cutoff 01-09 00:00 → events at 01-09 12:00, 01-10 12:00
    assert(numbers("r-age") == Seq(3L, 4L))
  }

  test("truncateBefore drops events below $tb") { assert(numbers("r-tb") == (3L to 9L)) }

  test("soft-deleted stream reads as NoStream") { assert(numbers("r-soft").isEmpty) }

  test("tombstoned stream reads as StreamDeleted") { assert(numbers("r-hard").isEmpty) }

  test("streams without metadata pass through") { assert(numbers("r-plain") == Seq(0L)) }

  test("metadataFromLog parses $$-metastreams, latest event wins, finds tombstones") {
    val log2 = envelope(Seq(
      ev("s1", 0, "E", 0),
      ev("$$s1", 0, "$metadata", 1, data = """{"$maxCount":5}"""),
      ev("$$s1", 1, "$metadata", 2, data = """{"$maxCount":2,"$maxAge":60,"$tb":1}"""),
      ev("s2", 0, "E", 3),
      ev("s2", 1, "$streamDeleted", 4)
    ))
    val m = Retention.metadataFromLog(log2).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("s1").getLong(1) == 2L)   // latest maxCount
    assert(m("s1").getLong(2) == 60L)  // maxAge
    assert(m("s1").getLong(3) == 1L)   // tb
    assert(!m("s1").getBoolean(4))
    assert(m("s2").getBoolean(4))      // tombstoned
  }
}
