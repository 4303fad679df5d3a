package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Funnel conversion (strictly-ordered stages) and weekly cohort
  * retention (SURVEY §2.6 event-analytics extensions). */
class EventAnalyticsSpec extends SparkTestBase {

  private def events(rows: (Long, String, Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("user_id", "event_type", "event_id", "ts_str")
      .withColumn("ts", to_timestamp(col("ts_str"))).drop("ts_str")
  }

  test("funnel counts only strictly-ordered completions") {
    val df = events(
      // user 1: full ordered funnel
      (1L, "signup", 10L, "2024-01-01 10:00:00"),
      (1L, "view", 20L, "2024-01-01 11:00:00"),
      (1L, "purchase", 30L, "2024-01-01 12:00:00"),
      // user 2: view BEFORE signup — stage 2 not reached
      (2L, "view", 5L, "2024-01-01 09:00:00"),
      (2L, "signup", 15L, "2024-01-01 10:00:00"),
      (2L, "purchase", 25L, "2024-01-01 11:00:00"),
      // user 3: signup + view only
      (3L, "signup", 11L, "2024-01-01 10:00:00"),
      (3L, "view", 21L, "2024-01-01 11:00:00"),
      // user 4: never signs up
      (4L, "view", 12L, "2024-01-01 10:00:00"),
      (4L, "purchase", 22L, "2024-01-01 11:00:00"))
    val out = EventAnalytics
      .funnelSummary(df, Seq("signup", "view", "purchase"))
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "signup", 3L), (2, "view", 2L), (3, "purchase", 1L)))
  }

  test("funnel stage positions are the EARLIEST valid completion") {
    val df = events(
      (1L, "signup", 10L, "2024-01-01 10:00:00"),
      (1L, "view", 12L, "2024-01-01 10:10:00"),
      (1L, "view", 14L, "2024-01-01 10:20:00"))
    val stages = EventAnalytics.funnelStages(df, Seq("signup", "view"))
    assert(stages(1).select("p").head().getLong(0) == 12L)
  }

  test("cohort retention offsets are whole weeks from first activity") {
    val df = events(
      // user 1: first week Jan 1 (Monday), returns week 2 and week 4
      (1L, "view", 1L, "2024-01-02 10:00:00"),
      (1L, "view", 2L, "2024-01-10 10:00:00"),
      (1L, "view", 3L, "2024-01-23 10:00:00"),
      // user 2: same cohort, week 0 only (twice — distinct weeks count once)
      (2L, "view", 4L, "2024-01-03 10:00:00"),
      (2L, "click", 5L, "2024-01-04 10:00:00"),
      // user 3: cohort week of Jan 8
      (3L, "view", 6L, "2024-01-08 10:00:00"),
      (3L, "view", 7L, "2024-01-16 10:00:00"))
    val out = EventAnalytics.cohortRetention(df)
      .orderBy("cohort", "week_offset").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1), r.getLong(2)))
      .toSeq
    assert(out == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 3, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("pathNgrams: adjacent-only sequences, never spanning users, tail windows dropped") {
    val df = events(
      // user 1: a -> b -> c -> b  => trigrams a>b>c, b>c>b
      (1L, "a", 1L, "2024-01-01 10:00:00"),
      (1L, "b", 2L, "2024-01-01 10:01:00"),
      (1L, "c", 3L, "2024-01-01 10:02:00"),
      (1L, "b", 4L, "2024-01-01 10:03:00"),
      // user 2: a -> b -> c  => a>b>c (no cross-user c>b>a etc.)
      (2L, "a", 5L, "2024-01-01 11:00:00"),
      (2L, "b", 6L, "2024-01-01 11:01:00"),
      (2L, "c", 7L, "2024-01-01 11:02:00"),
      // user 3: too short for any trigram
      (3L, "a", 8L, "2024-01-01 12:00:00"),
      (3L, "b", 9L, "2024-01-01 12:01:00"))
    val out = EventAnalytics.pathNgrams(df, n = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a>b>c" -> 2L, "b>c>b" -> 1L))
    // ties in ts break on event_id: same-ts events order deterministically
    val tied = events(
      (9L, "x", 11L, "2024-01-01 10:00:00"),
      (9L, "y", 12L, "2024-01-01 10:00:00"),
      (9L, "z", 13L, "2024-01-01 10:00:00"))
    val t = EventAnalytics.pathNgrams(tied, n = 3)
      .collect().map(r => r.getString(0)).toSeq
    assert(t == Seq("x>y>z"))
  }

  test("attributionLinear: equal split inside the window, cross-user and " +
    "out-of-window touches excluded, credits sum exactly") {
    val df = events(
      // user 1: view + click inside 72h of the purchase -> 1/2 each
      (1L, "view", 1L, "2024-01-01 10:00:00"),
      (1L, "click", 2L, "2024-01-02 10:00:00"),
      (1L, "purchase", 3L, "2024-01-03 10:00:00"),
      // user 1: second purchase — only the click is within ITS window?
      // no: both are, window is 72h back from 01-04 -> view(01-01)=exactly
      // 72h, excluded (tt >= ct - lookback is inclusive: 01-01 10:00 IS
      // the boundary, so it IS included) -> 1/2 each again
      (1L, "purchase", 4L, "2024-01-04 10:00:00"),
      // user 2: a single view -> full credit
      (2L, "view", 5L, "2024-01-05 10:00:00"),
      (2L, "purchase", 6L, "2024-01-05 11:00:00"),
      // user 2: a view AFTER the purchase never credits
      (2L, "view", 7L, "2024-01-05 12:00:00"),
      // user 3: touch with no conversion -> no credit
      (3L, "click", 8L, "2024-01-06 10:00:00"))
    val out = EventAnalytics.attributionLinear(df,
        touchTypes = Seq("view", "click"), convType = "purchase")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // purchase cid=3: view+click (1/2 each); cid=4: view at exactly -72h
    // (inclusive) + click -> 1/2 each; cid=6: one view -> 1/1
    assert(out("click") == ((2L, 1000000L)))
    assert(out("view") == ((3L, 2000000L)))
  }
}
