package graft.projections.js

import scala.collection.mutable

/** Runtime value model for the embedded JavaScript interpreter that powers
  * JS projection definitions (SURVEY.md §2.3; the reference's projection
  * query language is JavaScript, interpreted by Jint —
  * src/EventStore.Projections.Core/Services/Interpreted/JintProjectionStateHandler.cs:55-75).
  *
  * No JS engine ships in this sandbox (JDK 17 dropped Nashorn; no GraalJS
  * jar), so the subset the projection grammar needs is interpreted
  * natively. All values are Serializable: projection STATE is plain data
  * (objects/arrays/primitives) and flows through Dataset encoders;
  * functions never appear in state.
  *
  * Numbers are IEEE doubles, as in JS. Objects preserve insertion order
  * (LinkedHashMap) so JSON.stringify round-trips key order like Jint.
  */
sealed trait JsVal extends Serializable

case object JsUndef extends JsVal
case object JsNull extends JsVal
final case class JsBool(b: Boolean) extends JsVal
final case class JsNum(d: Double) extends JsVal
final case class JsStr(s: String) extends JsVal
final case class JsObj(fields: mutable.LinkedHashMap[String, JsVal]) extends JsVal
final case class JsArr(items: mutable.ArrayBuffer[JsVal]) extends JsVal
/** User function: parameter names + body AST + defining scope. */
final case class JsFunc(params: Seq[String], body: Seq[Stmt], closure: Env) extends JsVal
/** Host function exposed into JS (emit, linkTo, Math.floor, ...). */
final case class JsNative(name: String, arity: Int, f: Seq[JsVal] => JsVal) extends JsVal

/** Regex value (`/ab+c/gi` literal or `new RegExp(p, f)`). A plain class,
  * not a case class: JS regex objects compare by identity, and `lastIndex`
  * is the mutable cursor `g`-flagged exec/test advance. The compiled
  * `java.util.regex.Pattern` is non-serializable, so it is resolved lazily
  * through JsRegexOps' cache (ASTs and values may ride in task closures).
  * Regexes never appear in projection STATE — JSON.stringify renders them
  * as `{}` exactly like ES does. */
final class JsRegex(val pattern: String, val flags: String) extends JsVal {
  var lastIndex: Int = 0
  val global: Boolean = flags.indexOf('g') >= 0
  @transient private var cachedPattern: java.util.regex.Pattern = _
  def compiled: java.util.regex.Pattern = {
    if (cachedPattern == null) cachedPattern = JsRegexOps.compile(pattern, flags)
    cachedPattern
  }
}

/** Date value — ARGUMENT-constructed only (`new Date(ms)`,
  * `new Date(isoString)`, `new Date(y, m, ...)`): pure functions of their
  * inputs, so replays stay deterministic. The wall-clock forms
  * (`Date.now()`, no-arg `new Date()`) stay banned — JsInterp raises the
  * determinism error. A plain class like [[JsRegex]]: ES Date objects
  * compare by identity. `ms` is the ES time value (epoch milliseconds,
  * NaN = Invalid Date); all calendar math lives in [[JsDateOps]],
  * UTC-pinned. JSON.stringify renders the ISO string (ES Date.toJSON);
  * Invalid Date renders null. */
final class JsDate(val ms: Double) extends JsVal

/** Raised for JS-level type errors ("cannot read property of undefined").
  * Catchable by user `try/catch` — the reference's Jint surfaces engine
  * errors to handler catch blocks the same way. */
final class JsError(msg: String) extends RuntimeException(msg)
/** Execution-budget exhaustion. Deliberately NOT a JsError and NOT
  * catchable by user `try/catch`: a runaway handler wrapped in
  * `while(true){try{...}catch(e){}}` must still fail the projection. */
final class JsBudgetExceeded(msg: String) extends RuntimeException(msg)
/** JS `throw` statement payload. The message renders Error-shaped objects
  * as `name: message` so an uncaught throw fails the projection with the
  * JS-level message, like Jint's JavaScriptException. */
final class JsThrown(val value: JsVal) extends RuntimeException(JsThrown.render(value))

object JsThrown {
  private def render(v: JsVal): String = v match {
    case JsObj(m) if m.contains("message") =>
      val name = m.get("name").map(JsVal.toStr).getOrElse("Error")
      s"$name: ${JsVal.toStr(m("message"))}"
    case other => JsVal.toStr(other)
  }
}

object JsObj {
  def empty: JsObj = JsObj(mutable.LinkedHashMap.empty)
  def of(kvs: (String, JsVal)*): JsObj = JsObj(mutable.LinkedHashMap(kvs: _*))
}
object JsArr { def empty: JsArr = JsArr(mutable.ArrayBuffer.empty) }

object JsVal {

  def bool(v: JsVal): Boolean = v match {
    case JsUndef | JsNull => false
    case JsBool(b) => b
    case JsNum(d) => !(d == 0.0 || d.isNaN)
    case JsStr(s) => s.nonEmpty
    case _ => true
  }

  /** JS ToNumber. */
  def num(v: JsVal): Double = v match {
    case JsNum(d) => d
    case JsBool(b) => if (b) 1.0 else 0.0
    case JsNull => 0.0
    case JsUndef => Double.NaN
    case JsStr(s) => strToNum(s)
    case JsArr(items) if items.isEmpty => 0.0
    case JsArr(items) if items.size == 1 => num(items.head)
    case d: JsDate => d.ms // ES valueOf: the time value
    case _ => Double.NaN
  }

  /** ToNumber of a string — the engine's defined semantics (trimmed
    * Java double syntax, NaN on anything else), shared verbatim by the
    * column compiler's [[graft.functions.JsStringNumber]] so
    * `Number(str)` computes identically on both execution paths. */
  def strToNum(s: String): Double = {
    val t = s.trim
    if (t.isEmpty) 0.0
    else try t.toDouble catch { case _: NumberFormatException => Double.NaN }
  }

  /** ES parseInt — the engine's defined semantics (trim, sign-prefix
    * strip, longest radix-digit prefix, NaN when empty), shared by the
    * interpreter native and the column compiler's
    * [[graft.functions.JsParseInt]]. BigInt accumulation: a digit
    * string past Long range is a (huge, exactly-rounded) number in ES,
    * not an exception. An out-of-range radix yields no digits → NaN
    * before BigInt ever sees it. */
  def parseIntStr(s0: String, radix: Int): Double = {
    val s = s0.trim
    val neg = s.startsWith("-")
    val body = s.dropWhile(c => c == '+' || c == '-')
      .takeWhile(c => Character.digit(c, radix) >= 0)
    if (body.isEmpty) Double.NaN
    else {
      val mag = BigInt(body, radix).toDouble
      if (neg) -mag else mag
    }
  }

  private val parseFloatRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?".r

  /** ES parseFloat — longest decimal-literal prefix (the engine's
    * defined subset: no hex, no Infinity literal), NaN when none;
    * shared by the interpreter native and
    * [[graft.functions.JsParseFloat]]. */
  def parseFloatStr(s0: String): Double =
    parseFloatRe.findFirstIn(s0.trim).map(_.toDouble).getOrElse(Double.NaN)

  /** JS Number::toString (ECMA-262 6.1.6.1.20) — integral doubles print
    * without a decimal point ("1", not "1.0"), plain decimal up to 1e21
    * ("10000000000000000", never Java's "1.0E16"), exponential beyond
    * ("1e+21" / "1e-7"), matching what Jint's JSON.stringify and string
    * concatenation produce. Built from Java's shortest-round-trip digits
    * reformatted under the ECMA placement rules. */
  def numToStr(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else if (d == 0.0) "0"
    else if (d == math.rint(d) && math.abs(d) < 9.007199254740992e15)
      d.toLong.toString
    else {
      val sign = if (d < 0) "-" else ""
      // Java's repr carries the shortest digit string that round-trips;
      // extract (digits, n) with value = 0.digits × 10^n
      val repr = math.abs(d).toString
      val (mantissa, exp10) = repr.indexOf('E') match {
        case -1 => (repr, 0)
        case i => (repr.substring(0, i), repr.substring(i + 1).toInt)
      }
      val dot = mantissa.indexOf('.')
      val rawDigits = (mantissa.substring(0, dot) + mantissa.substring(dot + 1))
      val intLen = dot
      val digits0 = rawDigits.dropWhile(_ == '0')
      val leadingZeros = rawDigits.length - digits0.length
      val digits = digits0.reverse.dropWhile(_ == '0').reverse
      val n = intLen + exp10 - leadingZeros // value = 0.digits × 10^n
      val k = digits.length
      sign + (
        if (k <= n && n <= 21) digits + "0" * (n - k)
        else if (0 < n && n <= 21) digits.substring(0, n) + "." + digits.substring(n)
        else if (-6 < n && n <= 0) "0." + "0" * (-n) + digits
        else { // exponential, JS style: d.dddde±x
          val head = digits.substring(0, 1)
          val tail = if (k > 1) "." + digits.substring(1) else ""
          val e = n - 1
          head + tail + "e" + (if (e >= 0) "+" else "") + e
        })
    }

  /** JS ToString. */
  def toStr(v: JsVal): String = v match {
    case JsUndef => "undefined"
    case JsNull => "null"
    case JsBool(b) => b.toString
    case JsNum(d) => numToStr(d)
    case JsStr(s) => s
    case JsArr(items) => items.map {
      case JsUndef | JsNull => ""
      case x => toStr(x)
    }.mkString(",")
    case _: JsObj => "[object Object]"
    case r: JsRegex => s"/${r.pattern}/${r.flags}"
    // ES toString is the host-zone locale form; the deterministic engine
    // renders ISO (JsDateOps doc)
    case d: JsDate =>
      if (d.ms.isNaN) "Invalid Date" else JsDateOps.toIso(d.ms)
    case f: JsFunc => s"function(${f.params.mkString(", ")}) { ... }"
    case n: JsNative => s"function ${n.name}() { [native] }"
  }

  def typeOf(v: JsVal): String = v match {
    case JsUndef => "undefined"
    case JsNull => "object"
    case _: JsBool => "boolean"
    case _: JsNum => "number"
    case _: JsStr => "string"
    case _: JsFunc | _: JsNative => "function"
    case _ => "object"
  }

  /** Strict equality (===). Objects/arrays compare by reference. */
  def strictEq(a: JsVal, b: JsVal): Boolean = (a, b) match {
    case (JsNum(x), JsNum(y)) => x == y
    case (JsStr(x), JsStr(y)) => x == y
    case (JsBool(x), JsBool(y)) => x == y
    case (JsUndef, JsUndef) | (JsNull, JsNull) => true
    case (x: JsObj, y: JsObj) => x eq y
    case (x: JsArr, y: JsArr) => x eq y
    case (x: JsFunc, y: JsFunc) => x eq y
    case (x: JsRegex, y: JsRegex) => x eq y
    case (x: JsDate, y: JsDate) => x eq y
    case _ => false
  }

  /** Loose equality (==): the coercion subset projection code meets. */
  def looseEq(a: JsVal, b: JsVal): Boolean = (a, b) match {
    case (JsNull, JsUndef) | (JsUndef, JsNull) => true
    case (JsNum(_), JsStr(_)) => num(a) == num(b)
    case (JsStr(_), JsNum(_)) => num(a) == num(b)
    case (JsBool(_), _) => looseEq(JsNum(num(a)), b)
    case (_, JsBool(_)) => looseEq(a, JsNum(num(b)))
    // ES 7.2.14 steps 8-9: object == string/number coerces the object
    // via ToPrimitive (toString here: "[object Object]" / array join) —
    // Jint implements this; reference handlers can rely on [1]==1
    case (o @ (_: JsObj | _: JsArr), (_: JsStr | _: JsNum)) =>
      looseEq(JsStr(toStr(o)), b)
    case ((_: JsStr | _: JsNum), o @ (_: JsObj | _: JsArr)) =>
      looseEq(a, JsStr(toStr(o)))
    case _ => strictEq(a, b)
  }

  // ------------------------------------------------------------------ JSON

  /** JSON.stringify (compact form, no indent argument): insertion-order
    * keys, undefined-valued properties skipped, undefined in arrays →
    * null — Jint/ECMA behavior. Returns None for undefined/functions at
    * the top level. */
  def stringify(v: JsVal): Option[String] = v match {
    case JsUndef | _: JsFunc | _: JsNative => None
    case _ =>
      val sb = new StringBuilder
      writeJson(v, sb)
      Some(sb.toString)
  }

  private def writeJson(v: JsVal, sb: StringBuilder): Unit = v match {
    case JsNull | JsUndef => sb.append("null")
    case JsBool(b) => sb.append(b)
    case JsNum(d) =>
      if (d.isNaN || d.isInfinite) sb.append("null") else sb.append(numToStr(d))
    case JsStr(s) => writeJsonString(s, sb)
    case JsArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(',')
        first = false
        it match {
          case JsUndef | _: JsFunc | _: JsNative => sb.append("null")
          case x => writeJson(x, sb)
        }
      }
      sb.append(']')
    case JsObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        fv match {
          case JsUndef | _: JsFunc | _: JsNative => ()
          case x =>
            if (!first) sb.append(',')
            first = false
            writeJsonString(k, sb)
            sb.append(':')
            writeJson(x, sb)
        }
      }
      sb.append('}')
    case _: JsRegex => sb.append("{}") // ES: a regex is an object with no enumerable props
    case d: JsDate => // ES Date.prototype.toJSON: ISO string, null if invalid
      if (d.ms.isNaN) sb.append("null") else writeJsonString(JsDateOps.toIso(d.ms), sb)
    case _: JsFunc | _: JsNative => sb.append("null")
  }

  /** A string as a JSON string literal (quotes + escapes) — exposed for
    * the column compiler's runtime state rendering
    * (graft.functions.JsJsonString). */
  def jsonQuote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    writeJsonString(s, sb)
    sb.toString
  }

  private def writeJsonString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  /** JSON.parse → JsVal (throws JsError on malformed input). */
  def parseJson(text: String): JsVal = {
    val p = new JsonParser(text)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw new JsError(s"JSON.parse: trailing input at ${p.pos}")
    v
  }

  private final class JsonParser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!atEnd && (s.charAt(pos) == ' ' || s.charAt(pos) == '\n' ||
        s.charAt(pos) == '\r' || s.charAt(pos) == '\t')) pos += 1
    private def fail(msg: String) = throw new JsError(s"JSON.parse: $msg at $pos")
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    def parseValue(): JsVal = {
      skipWs()
      if (atEnd) fail("unexpected end")
      s.charAt(pos) match {
        case '{' =>
          pos += 1; skipWs()
          val m = mutable.LinkedHashMap.empty[String, JsVal]
          if (!atEnd && s.charAt(pos) == '}') { pos += 1; return JsObj(m) }
          var done = false
          while (!done) {
            skipWs()
            val k = parseString()
            skipWs(); expect(':')
            m(k) = parseValue()
            skipWs()
            if (!atEnd && s.charAt(pos) == ',') pos += 1
            else { expect('}'); done = true }
          }
          JsObj(m)
        case '[' =>
          pos += 1; skipWs()
          val a = mutable.ArrayBuffer.empty[JsVal]
          if (!atEnd && s.charAt(pos) == ']') { pos += 1; return JsArr(a) }
          var done = false
          while (!done) {
            a += parseValue()
            skipWs()
            if (!atEnd && s.charAt(pos) == ',') pos += 1
            else { expect(']'); done = true }
          }
          JsArr(a)
        case '"' => JsStr(parseString())
        case 't' =>
          if (s.startsWith("true", pos)) { pos += 4; JsBool(true) } else fail("bad literal")
        case 'f' =>
          if (s.startsWith("false", pos)) { pos += 5; JsBool(false) } else fail("bad literal")
        case 'n' =>
          if (s.startsWith("null", pos)) { pos += 4; JsNull } else fail("bad literal")
        case c if c == '-' || (c >= '0' && c <= '9') =>
          val start = pos
          if (c == '-') pos += 1
          while (!atEnd && { val ch = s.charAt(pos)
            (ch >= '0' && ch <= '9') || ch == '.' || ch == 'e' || ch == 'E' ||
              ch == '+' || ch == '-' }) pos += 1
          try JsNum(s.substring(start, pos).toDouble)
          catch { case _: NumberFormatException => fail("bad number") }
        case other => fail(s"unexpected '$other'")
      }
    }
    def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!atEnd && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (atEnd) fail("bad escape")
          s.charAt(pos) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'n' => sb.append('\n')
            case 't' => sb.append('\t'); case 'r' => sb.append('\r')
            case 'b' => sb.append('\b'); case 'f' => sb.append('\f')
            case 'u' =>
              if (pos + 4 >= s.length) fail("bad unicode escape")
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => fail(s"bad escape '\\$other'")
          }
          pos += 1
        } else { sb.append(c); pos += 1 }
      }
      expect('"')
      sb.toString
    }
  }
}

/** Lexical scope: a mutable binding frame chained to its parent. Created
  * per call/block at evaluation time. Serializable so a JsFunc captured in
  * a definition environment can ship inside closures if ever needed (state
  * values never contain Envs). */
final class Env(val parent: Option[Env]) extends Serializable {
  private val bindings = mutable.HashMap.empty[String, JsVal]
  def define(name: String, v: JsVal): Unit = bindings(name) = v
  def lookup(name: String): Option[JsVal] =
    bindings.get(name).orElse(parent.flatMap(_.lookup(name)))
  def assign(name: String, v: JsVal): Boolean =
    if (bindings.contains(name)) { bindings(name) = v; true }
    else parent.exists(_.assign(name, v))
}
