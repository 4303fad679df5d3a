package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Retention
import graft.projections.Projections
import graft.sources.{EventLogStore, PendingEvent}

/** ScalaCheck-generator properties for the algebraic reference semantics
  * (SURVEY.md §5.3): retention bounds (R1), fold determinism under input
  * permutation (P5), idempotent append (S1), and category extraction
  * (SYS1). Each property compares the Spark operator against a plain
  * Scala model of the reference's documented behavior, over deterministic
  * seeded samples (no scalatestplus bridge in the offline dep cache, so
  * sampling is driven directly). */
class PropertySpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i * 1013L)))

  private val streamMetaGen = for {
    nEvents <- Gen.choose(1, 12)
    maxCount <- Gen.option(Gen.choose(1L, 15L))
    tb <- Gen.option(Gen.choose(0L, 15L))
    tombstoned <- Gen.oneOf(true, false, false, false)
  } yield (nEvents, maxCount, tb, tombstoned)

  test("R1: retention bound equals max(0, last-maxCount+1, tb) per stream; tombstone hides all") {
    val s = spark; import s.implicits._
    for (streams <- samples(Gen.mapOfN(3, Gen.zip(Gen.oneOf("a", "b", "c", "d"), streamMetaGen)), 8)
         if streams.nonEmpty) {
      val events = streams.toSeq.flatMap { case (sid, (n, _, _, _)) =>
        (0 until n).map(i => ev(sid, i, "E", i * 10 + sid.hashCode.abs % 10))
      }
      val meta = streams.toSeq.map { case (sid, (_, mc, tb, tomb)) =>
        (sid, mc, Option.empty[Long], tb, tomb)
      }.toDF("stream_id", "max_count", "max_age_sec", "truncate_before", "tombstoned")
      val got = collectSet(
        Retention.applyRetention(envelope(events), meta, current_timestamp()),
        "stream_id", "event_number")
      val expected = streams.toSeq.flatMap { case (sid, (n, mc, tb, tomb)) =>
        val last = n - 1L
        val minNum = math.max(0L, math.max(
          mc.map(c => last - c + 1).getOrElse(0L), tb.getOrElse(0L)))
        if (tomb || tb.contains(Retention.DeletedStream)) Seq.empty
        else (minNum to last).map(i => Vector[Any](sid, i))
      }.toSet
      assert(got == expected, s"streams=$streams")
    }
  }

  test("P5: fold state is invariant to input row order (sorted by log_position internally)") {
    val s = spark; import s.implicits._
    for ((evs, round) <- samples(
        Gen.listOfN(20, Gen.zip(Gen.oneOf("s1", "s2", "s3"), Gen.choose(1, 100))), 6).zipWithIndex
        if evs.nonEmpty) {
      val rows = evs.zipWithIndex.map { case ((sid, v), i) =>
        ev(sid, 0L, "Add", i, data = v.toString)
      }
      val shuffled = new scala.util.Random(round).shuffle(rows)
      val proj = Projections.fromAll().foreachStream()
        .init("")
        .whenAny((st, e) => st + "," + e.data)
      val got = proj.states(envelope(shuffled)).collect().toMap
      val expected = rows.groupBy(_.stream_id).map { case (sid, es) =>
        sid -> es.sortBy(_.log_position).map(e => "," + e.data).mkString
      }
      assert(got == expected, s"evs=$evs")
    }
  }

  test("S1: append is idempotent by event_id — replaying a batch appends nothing") {
    for (batch <- samples(Gen.listOfN(6, Gen.zip(Gen.oneOf("x", "y"), Gen.choose(0, 3))), 5)
         if batch.nonEmpty) {
      val store = new EventLogStore(spark, Files.createTempDirectory("prop").toString)
      // event ids collide within the batch on purpose (same (sid, n))
      val pending = batch.map { case (sid, n) =>
        PendingEvent(sid, s"eid-$sid-$n", "E", s"""{"n":$n}""")
      }
      val distinctIds = pending.map(_.event_id).distinct.size
      val first = store.append(pending)
      val second = store.append(pending)
      assert(first == distinctIds, s"batch=$batch")
      assert(second == 0L)
      assert(store.read().count() == distinctIds)
      // event numbers are a gapless 0-based sequence per stream
      val nums = store.read().select("stream_id", "event_number").collect()
        .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted.toSeq }
      nums.values.foreach(seq => assert(seq == (0L until seq.size)))
    }
  }

  test("SYS1: category extraction matches first/last-separator split semantics") {
    val s = spark; import s.implicits._
    val idGen = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.const("-"))).map(_.mkString)
    for (ids <- samples(Gen.listOfN(8, idGen), 8) if ids.nonEmpty) {
      val df = ids.toDF("stream_id")
      val got = df.select(
        graft.operators.SystemProjections.categoryFirst(col("stream_id"), "-").as("f"),
        graft.operators.SystemProjections.categoryLast(col("stream_id"), "-").as("l")
      ).collect().map(r => (r.getString(0), r.getString(1))).toSeq
      // no separator -> null category (uncategorized, StreamCategoryExtractor.cs)
      val expected = ids.map { id =>
        val f = if (id.contains("-")) id.substring(0, id.indexOf("-")) else null
        val l = if (id.contains("-")) id.substring(0, id.lastIndexOf("-")) else null
        (f, l)
      }
      assert(got == expected, s"ids=$ids")
    }
  }

  // ---- JS value layer (projections/js): JSON round-trip + JS semantics

  private val jsonValGen: Gen[graft.projections.js.JsVal] = {
    import graft.projections.js._
    import scala.collection.mutable
    val leaf: Gen[JsVal] = Gen.oneOf(
      Gen.const(JsNull),
      Gen.oneOf(true, false).map(JsBool(_)),
      // JSON-representable numbers: finite doubles (ints and decimals)
      Gen.oneOf(
        Gen.choose(-1000000L, 1000000L).map(l => JsNum(l.toDouble)),
        Gen.choose(-1000.0, 1000.0).map(JsNum(_))),
      Gen.alphaNumStr.map(s => JsStr(s.take(12))),
      Gen.const(JsStr("q\"uo\\te\n\ttab")))
    def obj(depth: Int): Gen[JsVal] =
      if (depth == 0) leaf
      else Gen.oneOf(leaf,
        Gen.listOfN(3, Gen.zip(Gen.alphaNumStr.map(_.take(6)), obj(depth - 1)))
          .map(kvs => JsObj(mutable.LinkedHashMap(kvs.distinctBy(_._1): _*))),
        Gen.listOfN(3, obj(depth - 1)).map(vs => JsArr(mutable.ArrayBuffer(vs: _*))))
    obj(2)
  }

  test("JS JSON: parse(stringify(v)) == v for generated value trees") {
    import graft.projections.js.JsVal
    samples(jsonValGen, 300).foreach { v =>
      val json = JsVal.stringify(v).get
      val back = JsVal.parseJson(json)
      assert(back == v, s"round-trip failed for $json")
      // stringify is stable through the round-trip (canonical form)
      assert(JsVal.stringify(back).get == json)
    }
  }

  test("JS numbers: integral doubles print without a decimal point, like JS") {
    import graft.projections.js.JsVal
    samples(Gen.choose(-9007199254740L, 9007199254740L), 200).foreach { l =>
      assert(JsVal.numToStr(l.toDouble) == l.toString, s"$l")
    }
    assert(JsVal.numToStr(1.5) == "1.5")
    assert(JsVal.numToStr(-0.0) == "0")
    assert(JsVal.numToStr(Double.NaN) == "NaN")
    // ECMA Number::toString placement rules — where Java's Double.toString
    // would print E-notation, JS stays decimal up to 1e21
    assert(JsVal.numToStr(1e16) == "10000000000000000")
    assert(JsVal.numToStr(12345678.9) == "12345678.9")
    assert(JsVal.numToStr(1e21) == "1e+21")
    assert(JsVal.numToStr(1.5e22) == "1.5e+22")
    assert(JsVal.numToStr(1e-6) == "0.000001")
    assert(JsVal.numToStr(1e-7) == "1e-7")
    assert(JsVal.numToStr(-2.5e-8) == "-2.5e-8")
    assert(JsVal.numToStr(0.1 + 0.2) == "0.30000000000000004")
    assert(JsVal.numToStr(123.456) == "123.456")
  }

  test("JS interpreter arithmetic matches Scala double semantics on samples") {
    import graft.projections.js._
    val in = new JsInterp
    def run(src: String): JsVal = in.run(JsParser.program(src))
    samples(Gen.zip(Gen.choose(-10000, 10000), Gen.choose(1, 997)), 100)
      .foreach { case (a, b) =>
        assert(run(s"$a % $b") == JsNum((a.toDouble % b)), s"$a % $b")
        assert(run(s"($a + $b) * 2 - $a") == JsNum((a.toDouble + b) * 2 - a))
        assert(run(s"Math.floor($a / $b)") == JsNum(math.floor(a.toDouble / b)))
      }
  }

  // ---- JSON serializer fidelity (the reference's custom serializer,
  // JintProjectionStateHandler.cs:1007-1196: integer-valued doubles print
  // as `1` not `1.0`, key order is insertion order, NaN/Infinity → null).
  // Projection state round-trips through this JSON at every checkpoint, so
  // divergence would compound silently; these properties pin it against
  // generated state shapes.

  private def jsonValGen(depth: Int): Gen[graft.projections.js.JsVal] = {
    import graft.projections.js._
    import scala.collection.mutable
    val keyGen = Gen.oneOf(
      Gen.identifier.map(_.take(8)),
      Gen.oneOf("a key", "with\"quote", "tab\there", "π-key", "$init"))
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("", "line\nbreak", "back\\slash", "quo\"te", "ctrlchar",
        "tab\t", "null", "ünïcødé"))
    val scalar: Gen[JsVal] = Gen.frequency(
      3 -> Gen.choose(-1000000L, 1000000L).map(l => JsNum(l.toDouble)),
      2 -> Gen.choose(-1000000.0, 1000000.0).map(JsNum(_)),
      2 -> strGen.map(JsStr(_)),
      1 -> Gen.oneOf(JsBool(true), JsBool(false), JsNull))
    if (depth == 0) scalar
    else Gen.frequency(
      2 -> scalar,
      1 -> Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, jsonValGen(depth - 1)))
        .map(items => JsArr(mutable.ArrayBuffer(items: _*))),
      2 -> Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, Gen.zip(keyGen, jsonValGen(depth - 1))))
        .map(kvs => JsObj(mutable.LinkedHashMap(kvs: _*))))
  }

  test("JSON: stringify∘parse is identity on serialized form (values, key ORDER, escapes)") {
    import graft.projections.js._
    samples(jsonValGen(3), 300).foreach { v =>
      val once = JsVal.stringify(v).get
      val twice = JsVal.stringify(JsVal.parseJson(once)).get
      // LinkedHashMap equality ignores order, so the ORDER pin is the
      // serialized-form comparison itself
      assert(twice == once, s"value=$v")
    }
  }

  test("JSON: integral doubles serialize without a decimal point, like the oracle SQL") {
    import graft.projections.js._
    import scala.collection.mutable
    samples(Gen.zip(Gen.choose(0L, 5000L), Gen.choose(-100000L, 100000L)), 100)
      .foreach { case (n, cents) =>
        // exactly the string DuckDB's '||' concatenation builds in the
        // js_output_state oracle: '{"n":3,"cents":42}'
        val state = JsObj(mutable.LinkedHashMap(
          "n" -> JsNum(n.toDouble), "cents" -> JsNum(cents.toDouble)))
        assert(JsVal.stringify(state).get == s"""{"n":$n,"cents":$cents}""")
      }
  }

  test("JSON: NaN/Infinity serialize as null; undefined drops from objects, nulls in arrays") {
    import graft.projections.js._
    import scala.collection.mutable
    val v = JsObj(mutable.LinkedHashMap(
      "nan" -> JsNum(Double.NaN),
      "inf" -> JsNum(Double.PositiveInfinity),
      "gone" -> JsUndef,
      "arr" -> JsArr(mutable.ArrayBuffer(JsUndef, JsNum(Double.NegativeInfinity), JsNum(1.0)))))
    assert(JsVal.stringify(v).get == """{"nan":null,"inf":null,"arr":[null,null,1]}""")
    assert(JsVal.stringify(JsUndef).isEmpty) // top-level undefined: no output
  }

  test("hash60Jvm == the hash60 Column expression for generated ids") {
    val s = spark; import s.implicits._
    val ids = (Gen.listOfN(200, Gen.chooseNum(Long.MinValue, Long.MaxValue))(
      Gen.Parameters.default, Seed(11L)).get :+ 0L :+ -1L :+ Long.MaxValue)
    val viaCol = ids.toDF("id")
      .select(col("id"), graft.functions.TextFunctions.hash60(col("id").cast("string")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(graft.analytics.CorpusStream.hash60Jvm(id) == viaCol(id),
        s"hash60Jvm diverges from the column form at id=$id")
    }
  }

  test("rarityScores: the three-level decomposed rank equals the naive " +
    "global dense_rank on generated corpora") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // heavy-tailed vocabulary: few hot words, many hapaxes, prefix
    // collisions by construction (shared 1-2 char stems)
    val wordGen = Gen.frequency(
      7 -> Gen.oneOf("a", "ab", "abc", "the", "thx", "t"),
      3 -> Gen.choose(0, 5000).map(i => s"w${i.toHexString}"))
    val docsGen = Gen.listOfN(120, Gen.listOfN(12, wordGen))
    val docsList = docsGen(Gen.Parameters.default, Seed(7L)).get
    val docs = docsList.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val fast = graft.analytics.Corpus.rarityScores(docs)
      .select("id", "n_tokens", "rank_sum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the naive single-partition formulation the decomposition replaces
    val toks = docs.select(col("doc_id").as("id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .where(length(col("word")) > 0)
    val naive = toks.groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("rank",
        dense_rank().over(Window.orderBy(col("n").desc, col("word"))))
    val slow = toks.join(naive, "word").groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("rank").cast("long")).as("rank_sum")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == slow)
  }
}
