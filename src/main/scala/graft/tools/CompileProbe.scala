package graft.tools
object CompileProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def c(name: String, src: String) =
      println(name + ": " + graft.projections.js.JsProjection.compile(src).compilesToColumns)
    c("early-regex", """fromAll().foreachStream().when({
      $init: function() { return { a: 0 }; },
      $any: function(s, e) {
        if (!(/2/.test(e.streamId))) { return s; }
        s.a += 1; return s; } })""")
    c("concat-two-sites", """fromAll().foreachStream().when({
      $init: function() { return { b: '' }; },
      $any: function(s, e) {
        s.b += e.streamId.replace(/\d/g, '*') + '|';
        s.b = s.b + e.eventType + ';'; return s; } })""")
    c("concat-replace", """fromAll().foreachStream().when({
      $init: function() { return { b: '' }; },
      $any: function(s, e) { s.b += e.streamId.replace(/\d/g, '*') + '|'; return s; } })""")
    c("min-getTime", """fromAll().partitionBy(function(e) {
        return new Date(e.timestamp).toISOString().slice(0, 10);
      }).when({
      $init: function() { return { a: 100 }; },
      $any: function(s, e) {
        var d = new Date(e.timestamp);
        s.a = Math.min(s.a, d.getTime()); return s; } })""")
    c("typed-early", """fromAll().foreachStream().when({
      $init: function() { return { a: 100 }; },
      t2: function(s, e) {
        if (!(/2/.test(e.streamId))) { return s; }
        s.a = Math.min(s.a, (e.value * 1.25)); return s; },
      $any: function(s, e) { s.a = Math.min(s.a, e.value); return s; } })""")
    spark.stop()
  }
}
