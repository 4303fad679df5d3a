package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.projections.js.JsStreamStepper

/** Pins the r16 bounded-memory per-key sort (JsStreamStepper.sortedByPos):
  * the spill path (maxBuffer smaller than the slice, sorted runs merged
  * from disk) must produce exactly the order of the in-memory path, for
  * every input shape the stepper sees — including duplicate positions
  * (stable toward arrival order) and empty slices. */
class StepperSortSpec extends AnyFunSuite {

  private def row(pos: Long, tag: String): Row = Row(tag, pos)

  private def positions(it: Iterator[Row]): Seq[(Long, String)] =
    it.map(r => (r.getLong(1), r.getString(0))).toSeq

  test("spill path == in-memory path on shuffled unique positions") {
    val rnd = new scala.util.Random(42)
    val rows = rnd.shuffle((0L until 10000L).toVector).map(p => row(p, s"e$p"))
    val inMem = positions(
      JsStreamStepper.sortedByPos(rows.iterator, 1, maxBuffer = 1 << 20))
    val spilled = positions(
      JsStreamStepper.sortedByPos(rows.iterator, 1, maxBuffer = 257))
    assert(spilled == inMem)
    assert(inMem.map(_._1) == (0L until 10000L))
  }

  test("duplicate positions keep arrival order (stable like the old sortBy)") {
    val rows = Vector(row(5, "a"), row(1, "b"), row(5, "c"), row(1, "d"),
      row(5, "e"), row(0, "f"), row(1, "g"))
    val expect = positions(
      JsStreamStepper.sortedByPos(rows.iterator, 1, maxBuffer = 100))
    // several spill geometries, including run boundaries splitting ties
    for (mb <- Seq(2, 3, 4, 5)) {
      val got = positions(
        JsStreamStepper.sortedByPos(rows.iterator, 1, maxBuffer = mb))
      assert(got == expect, s"maxBuffer=$mb")
    }
    assert(expect == Seq((0L, "f"), (1L, "b"), (1L, "d"), (1L, "g"),
      (5L, "a"), (5L, "c"), (5L, "e")))
  }

  test("empty and single-row slices") {
    assert(JsStreamStepper.sortedByPos(Iterator.empty, 1, 4).isEmpty)
    val one = positions(JsStreamStepper.sortedByPos(
      Iterator.single(row(7, "x")), 1, 1))
    assert(one == Seq((7L, "x")))
  }

  test("runs longer than the reset cadence stay ordered; spill files are " +
      "deleted on consumption (r17 stream-reset + cleanup)") {
    // runs of 1500 rows cross the SpillResetEvery=512 boundary twice each,
    // so the TC_RESET framing is exercised mid-run on both stream sides
    assert(JsStreamStepper.SpillResetEvery < 1500)
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def spillFiles(): Set[String] = tmp.listFiles()
      .filter(_.getName.startsWith("graft-stepper-sort")).map(_.getName).toSet
    val before = spillFiles()
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0L until 12000L).toVector).map(p => row(p, s"e$p"))
    val spilled = positions(
      JsStreamStepper.sortedByPos(rows.iterator, 1, maxBuffer = 1500))
    assert(spilled.map(_._1) == (0L until 12000L))
    assert(spillFiles() == before, "spill files must be deleted once consumed")
  }
}
