package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.functions.TextFunctions

/** SQL function surface: the extensions path registers every `graft_*`
  * function into a real session, SQL results equal the Column API they
  * wrap, imperative registration is session-scoped, and bad geometry
  * arguments fail at analysis, not at runtime. */
class GraftExtensionsSpec extends SparkTestBase {

  /** A REAL extensions-applied session over the shared context — the
    * same construction `spark.sql.extensions=graft.GraftExtensions`
    * performs. */
  private lazy val ext = {
    val s = Bridge.sessionWithExtensions(spark.sparkContext, new GraftExtensions)
    graft.sources.Tables.documents(s, "/root/testdata/sf0.001")
      .createOrReplaceTempView("docs")
    s
  }

  test("every registered function is callable from SQL in an " +
    "extensions-built session") {
    val samples = Map(
      "graft_tokens" -> "graft_tokens('a b  c')",
      "graft_token_count" -> "graft_token_count('a b  c')",
      "graft_quality_score" -> "graft_quality_score('the quick brown fox.')",
      "graft_punct_ratio" -> "graft_punct_ratio('a,b.')",
      "graft_stopword_ratio" -> "graft_stopword_ratio('the cat and a dog')",
      "graft_mean_word_len" -> "graft_mean_word_len('ab cdef')",
      "graft_lang_id" -> "graft_lang_id('the quick brown fox')",
      "graft_fingerprint" -> "graft_fingerprint('Some  Text!')",
      "graft_hash60" -> "graft_hash60('x')",
      "graft_pii_redact" -> "graft_pii_redact('mail a@b.co now')",
      "graft_bpe_pieces" -> "graft_bpe_pieces('hello world')",
      "graft_bpe_token_count" -> "graft_bpe_token_count('hello world')",
      "graft_bpe_tokenize" -> "graft_bpe_tokenize('the thing')",
      "graft_unigram_tokenize" -> "graft_unigram_tokenize('the table')",
      "graft_wordpiece_tokenize" -> "graft_wordpiece_tokenize('the value key')",
      "graft_shingles" -> "graft_shingles('a b c d', 2)",
      "graft_winnow_fp" -> "graft_winnow_fp('some text to winnow', 5, 4)",
      "graft_lang_score" -> "graft_lang_score('the quick fox', 'en')",
      "graft_cosine" -> "graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))")
    val missing = GraftFunctions.registry.map(_._1).filterNot(samples.contains)
    assert(missing.isEmpty, s"no SQL sample for: $missing — extend this spec")
    samples.foreach { case (name, sql) =>
      val rows = ext.sql(s"SELECT $sql AS v").collect()
      assert(rows.length == 1, s"$name returned ${rows.length} rows")
    }
    // spot values
    assert(ext.sql("SELECT graft_token_count('a b  c') v").head.getLong(0) == 3L)
    assert(ext.sql("SELECT graft_wordpiece_tokenize('value') v")
      .head.getSeq[String](0) == Seq("val", "##ue"))
    assert(math.abs(ext.sql("SELECT graft_cosine(array(1.0d,2.0d), array(1.0d,2.0d)) v")
      .head.getDouble(0) - 1.0) < 1e-12)
  }

  test("SQL results equal the Column API they wrap, over the corpus") {
    val viaSql = ext.sql(
      """SELECT doc_id,
        |  graft_token_count(text) AS n_tok,
        |  graft_lang_id(text) AS lang,
        |  graft_quality_score(text) AS q,
        |  graft_fingerprint(text) AS fp,
        |  graft_bpe_token_count(text) AS n_bpe,
        |  graft_wordpiece_tokenize(text) AS wp,
        |  graft_shingles(text, 3) AS sh
        |FROM docs ORDER BY doc_id""".stripMargin).collect()
    val viaCol = graft.sources.Tables.documents(ext, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
        TextFunctions.langId(col("text")).as("lang"),
        TextFunctions.qualityScore(col("text")).as("q"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_bpe"),
        graft.analytics.WordPiece.tokenize(col("text")).as("wp"),
        TextFunctions.shingles(col("text"), 3).as("sh"))
      .orderBy(col("doc_id")).collect()
    assert(viaSql.length == viaCol.length && viaSql.nonEmpty)
    viaSql.zip(viaCol).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, s"SQL != Column API for doc ${a.getLong(0)}")
    }
  }

  test("imperative registration is session-scoped") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    GraftFunctions.register(s1)
    assert(s1.sql("SELECT graft_token_count('a b') v").head.getLong(0) == 2L)
    val err = intercept[Exception] {
      s2.sql("SELECT graft_token_count('a b') v").collect()
    }
    assert(err.getMessage.contains("graft_token_count"),
      s"unexpected failure shape: ${err.getMessage}")
    // re-registration is idempotent
    GraftFunctions.register(s1)
    assert(s1.sql("SELECT graft_token_count('a b c') v").head.getLong(0) == 3L)
  }

  test("bad geometry fails at analysis: wrong arity and non-literal ints") {
    val e1 = intercept[Exception] {
      ext.sql("SELECT graft_shingles('a b', 2, 3)").collect()
    }
    assert(e1.getMessage.contains("argument"), e1.getMessage)
    val e2 = intercept[Exception] {
      ext.sql("SELECT graft_winnow_fp(text, CAST(doc_id AS INT), 4) FROM docs").collect()
    }
    assert(e2.getMessage.contains("integer literal"), e2.getMessage)
    val e3 = intercept[Exception] {
      ext.sql("SELECT graft_lang_score('x', doc_id) FROM docs").collect()
    }
    assert(e3.getMessage.contains("string literal"), e3.getMessage)
  }
}
