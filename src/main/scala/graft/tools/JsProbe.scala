package graft.projections.js


import graft.projections.{Emitter, LogEvent}

/** Micro-benchmark of the JS handler hot path, outside Spark: events/sec
  * through CompiledJsProjection.step for a typical fold handler. */
object JsProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val src = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { n: 0, cents: 0 } },
        purchase: function(s, e) {
            s.n += 1;
            s.cents += Math.round(e.value * 100);
            return s;
        }
    })"""
    val c = CompiledJsProjection.get(src)
    val em = new Emitter
    def run(): Double = {
      var state: JsVal = c.initState()
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        val e = LogEvent(s"purchase-${i % 50}", i.toLong, "purchase", i.toLong,
          new java.sql.Timestamp(i.toLong), null, s"""{"k":${i % 100},"x":"abc"}""", i * 0.01)
        state = c.step(state, e, em)
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      n / sec
    }
    run() // warmup
    for (r <- 1 to 3) println(f"[jsprobe] run$r: ${run()}%.0f events/s")
  }
}
