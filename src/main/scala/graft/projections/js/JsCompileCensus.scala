package graft.projections.js

/** Compiled-vs-interpreted census over every JS projection definition the
  * repo registers or tests (r17; VERDICT r16 #6 / r15 #5): for each
  * definition, report which execution tier serves it —
  *
  *  - `compiled`            — whole-definition Column plan (fastPlan),
  *                            pure select/aggregate, no interpreter;
  *  - `compiled+prestate`   — compiled, with pre-state running-value
  *                            WINDOW columns in batch; streaming goes
  *                            through the typed per-key stepper
  *                            ([[JsStreamStepper]]) when `stepper=yes`;
  *  - `interpreted`         — the JsInterp fold (the reference-semantics
  *                            fallback tier). Every such row needs an
  *                            explanation in the committed census doc.
  *
  * The emit column reports the emitted()-path tier the same way
  * (stateless compiled emit / stateful emit riding the states plan /
  * interpreted).
  *
  * Usage: JsCompileCensus [outFile]
  * Covers: (1) every registered `js_*` query source
  * ([[JsProjectionQueries.handlerCorpus]]); (2) every
  * `JsProjection.compile` triple-quoted literal in JsEngineSpec.scala,
  * extracted textually and tagged with its line number (negative-test
  * sources that fail to parse are reported as `parse-error`, which is
  * their point). Prints a markdown table; also written to outFile
  * (default /tmp/js_census.md). */
object JsCompileCensus {

  final case class Row(name: String, selector: String, batch: String,
      stepper: String, emit: String)

  def statusOf(name: String, source: String): Row = {
    val cp =
      try CompiledJsProjection.get(source)
      catch {
        case e: Throwable =>
          return Row(name, "-", s"parse-error (${e.getClass.getSimpleName})",
            "-", "-")
      }
    val batch = cp.fastPlan match {
      case Some(p) if p.usesPreState => "compiled+prestate"
      case Some(_) => "compiled"
      case None => "interpreted"
    }
    val stepper = cp.fastPlan match {
      case Some(p) if p.usesPreState =>
        if (p.stepSpec.isDefined) "yes" else "NO (window plan only)"
      case Some(_) => "n/a (stateless plan streams natively)"
      case None => "interpreted"
    }
    val emit = cp.fastEmitPlan match {
      case Some(p) if p.usesPreState => "compiled+prestate"
      case Some(_) => "compiled"
      case None =>
        // an emitted() call on a definition that never emits returns no
        // rows; distinguish that from a real interpreter fallback
        if (!source.contains("emit") && !source.contains("linkTo")) "no emits"
        else "interpreted"
    }
    Row(name, cp.spec.selector.getClass.getSimpleName.stripSuffix("$"),
      batch, stepper, emit)
  }

  /** Extract `JsProjection.compile` triple-quoted literals (with line
    * numbers) from a Scala source file. Textual, deliberately simple:
    * finds the marker, then the next triple-quote pair; a trailing
    * `.stripMargin` is honored so piped sources census as written. */
  def extractFromSpec(path: String): Seq[(Int, String)] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    val marker = "JsProjection.compile("
    val tq = "\"\"\""
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var from = 0
    while ({ val i = text.indexOf(marker, from); from = i; i >= 0 }) {
      val line = text.substring(0, from).count(_ == '\n') + 1
      val open = text.indexOf(tq, from)
      if (open >= 0 && open - from < marker.length + 8) {
        val close = text.indexOf(tq, open + 3)
        if (close > open) {
          var src = text.substring(open + 3, close)
          if (text.startsWith(tq + ".stripMargin", close))
            src = src.linesIterator
              .map(l => { val i = l.indexOf('|'); if (i >= 0) l.substring(i + 1) else l })
              .mkString("\n")
          out += ((line, src))
        }
      }
      from = from + marker.length
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("/tmp/js_census.md")
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    JsProjectionQueries.handlerCorpus.sortBy(_._1).foreach { case (name, src) =>
      rows += statusOf(name, src)
    }
    val specPath = "src/test/scala/graft/JsEngineSpec.scala"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(specPath)))
      extractFromSpec(specPath).foreach { case (line, src) =>
        rows += statusOf(s"JsEngineSpec.scala:$line", src)
      }
    val sb = new StringBuilder
    sb ++= "| definition | selector | batch | stepper | emit |\n"
    sb ++= "|---|---|---|---|---|\n"
    rows.foreach(r =>
      sb ++= s"| ${r.name} | ${r.selector} | ${r.batch} | ${r.stepper} | ${r.emit} |\n")
    val interp = rows.count(r => r.batch == "interpreted")
    val parseErr = rows.count(r => r.batch.startsWith("parse-error"))
    sb ++= s"\n${rows.size} definitions: " +
      s"${rows.count(_.batch.startsWith("compiled"))} compiled, " +
      s"$interp interpreted, $parseErr parse-error (negative tests).\n"
    print(sb)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
