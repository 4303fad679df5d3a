package graft.projections.js

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.{Matcher, Pattern, PatternSyntaxException}

import scala.collection.mutable

/** ECMAScript regex semantics compiled onto `java.util.regex`.
  *
  * Regexes are deterministic, so the interpreter's Date/random ban does not
  * apply to them — the reference's Jint engine ships full ECMAScript regex
  * and real projection handlers use `str.match(/…/)`, regex `replace`,
  * `split` and `test` routinely (JintProjectionStateHandler.cs handlers run
  * arbitrary handler ES).
  *
  * Flavor notes (JS → java.util.regex): the syntaxes agree on everything
  * projection handlers use — classes, quantifiers, groups (incl. named
  * `(?<n>…)`), alternation, `\d \w \s \b`, lookahead and lookbehind.
  * Documented edge cases where Java is stricter than JS Annex B:
  *   - a bare `{` that is not a quantifier is a literal in JS but a
  *     `PatternSyntaxException` in Java → surfaces as a catchable
  *     SyntaxError-shaped JsError, never a silent wrong answer;
  *   - octal escapes (`\1` as an octal when no group 1 exists) are
  *     rejected rather than reinterpreted.
  * Flags: `g i m s u` supported (`i` maps to CASE_INSENSITIVE+UNICODE_CASE,
  * `m` MULTILINE, `s` DOTALL, `u` UNICODE_CHARACTER_CLASS; `g` drives the
  * lastIndex/replace-all/match-all semantics below). `y`/`d` are rejected
  * with a clear error — sticky regexes never appear in handler code.
  */
private[js] object JsRegexOps {

  /** Pattern cache: compiled Patterns are immutable and thread-safe, and a
    * regex literal evaluates to a FRESH JsRegex object on every evaluation
    * (ES semantics) — without the cache a literal inside a per-event
    * handler would recompile per event. */
  private val cache = new ConcurrentHashMap[String, Pattern]()

  def validateFlags(flags: String): Unit = {
    val bad = flags.filterNot("gimsu".contains(_))
    if (bad.nonEmpty)
      throw new JsError(
        s"SyntaxError: unsupported regex flag(s) '$bad' (supported: g i m s u)")
    if (flags.distinct.length != flags.length)
      throw new JsError(s"SyntaxError: duplicate regex flags '$flags'")
  }

  def compile(pattern: String, flags: String): Pattern = {
    validateFlags(flags)
    cache.computeIfAbsent(flags + "\u0000" + pattern, { _ =>
      var bits = 0
      if (flags.contains('i')) bits |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      if (flags.contains('m')) bits |= Pattern.MULTILINE
      if (flags.contains('s')) bits |= Pattern.DOTALL
      if (flags.contains('u')) bits |= Pattern.UNICODE_CHARACTER_CLASS
      try Pattern.compile(pattern, bits)
      catch {
        case e: PatternSyntaxException =>
          throw new JsError(
            s"SyntaxError: invalid regular expression /$pattern/$flags: ${e.getDescription}")
      }
    })
  }

  /** Construct + eagerly validate (dynamic `new RegExp(...)` throws its
    * SyntaxError at construction, catchable, like ES). */
  def make(pattern: String, flags: String): JsRegex = {
    compile(pattern, flags)
    new JsRegex(pattern, flags)
  }

  // ------------------------------------------------- backtracking guard

  /** The interpreter's step budget counts a whole regex call as ONE step,
    * but `java.util.regex` backtracks exponentially inside that one call:
    * `/(a+)+b/` against 40 a's is ~2^40 internal operations — an
    * untrusted handler regex plus adversarial corpus data would pin an
    * executor core for hours (the engine-level analog of the reference
    * running Jint under a TimeConstraint). Every matcher therefore reads
    * the subject through a counting CharSequence: the match engine touches
    * `charAt` on every step it takes, so bounding reads bounds
    * backtracking. The budget is generous — max(1M, 2000·len) reads; a
    * linear pass reads each char a handful of times, so real handler
    * regexes sit orders of magnitude below it — and tripping it throws a
    * CATCHABLE JsError, never a silent wrong answer or a hung task. */
  private final class GuardedSeq(s: String, budget: Long) extends CharSequence {
    private var reads = 0L
    def length: Int = s.length
    def charAt(i: Int): Char = {
      reads += 1
      if (reads > budget)
        throw new JsError(
          "Error: regex execution budget exceeded (catastrophic backtracking?)")
      s.charAt(i)
    }
    def subSequence(a: Int, b: Int): CharSequence = s.subSequence(a, b)
    override def toString: String = s
  }

  private def guardedMatcher(r: JsRegex, s: String): Matcher =
    r.compiled.matcher(new GuardedSeq(s, math.max(1000000L, s.length.toLong * 2000L)))

  /** java.util.regex matches by RECURSION for non-deterministic loops, so
    * a pattern like `(ab?)+c$` against a few thousand chars throws
    * StackOverflowError — an Error, which would kill the executor thread
    * uncatchably where the read budget never fires. The regex engine
    * unwinds cleanly (pure computation, no shared state mid-match), so
    * converting it to the same catchable JsError is safe and keeps the
    * contract: hostile pattern+data can fail a HANDLER, never a task. */
  private def guardSOE[A](f: => A): A =
    try f
    catch {
      case _: StackOverflowError =>
        throw new JsError(
          "Error: regex execution budget exceeded (pattern recursion too deep)")
    }

  // ------------------------------------------------------------- exec/test

  /** RegExp.prototype.exec: `g` starts at lastIndex and advances it
    * (0 on failure); non-global always searches from 0 and leaves
    * lastIndex alone. Returns [full, group1, …] (JsUndef for unmatched
    * groups) or null. */
  def exec(r: JsRegex, s: String): JsVal = guardSOE {
    val start = if (r.global) r.lastIndex else 0
    if (start < 0 || start > s.length) { r.lastIndex = 0; JsNull }
    else {
      val m = guardedMatcher(r, s)
      if (!m.find(start)) {
        if (r.global) r.lastIndex = 0
        JsNull
      } else {
        if (r.global) r.lastIndex = m.end
        groupsArr(m)
      }
    }
  }

  def test(r: JsRegex, s: String): Boolean = exec(r, s) != JsNull

  private def groupsArr(m: Matcher): JsArr = {
    val buf = mutable.ArrayBuffer.empty[JsVal]
    buf += JsStr(m.group(0))
    var i = 1
    while (i <= m.groupCount) {
      buf += (if (m.group(i) == null) JsUndef else JsStr(m.group(i)))
      i += 1
    }
    JsArr(buf)
  }

  // ---------------------------------------------------------- match/search

  /** String.prototype.match: non-global delegates to exec; global collects
    * every full match from 0 (zero-width matches advance by one) and
    * resets lastIndex. Null when nothing matches. */
  def matchStr(s: String, r: JsRegex): JsVal =
    if (!r.global) exec(r, s)
    else guardSOE {
      val m = guardedMatcher(r, s)
      val buf = mutable.ArrayBuffer.empty[JsVal]
      var from = 0
      while (from <= s.length && m.find(from)) {
        buf += JsStr(m.group(0))
        from = if (m.end == m.start) m.end + 1 else m.end
      }
      r.lastIndex = 0
      if (buf.isEmpty) JsNull else JsArr(buf)
    }

  /** String.prototype.search: first match index or -1; ignores `g` and
    * never touches lastIndex. */
  def search(s: String, r: JsRegex): Double = guardSOE {
    val m = guardedMatcher(r, s)
    if (m.find(0)) m.start.toDouble else -1.0
  }

  // ---------------------------------------------------------------- split

  /** String.prototype.split with a regex separator — the ES algorithm,
    * including the part Java's Pattern.split drops: CAPTURE GROUPS ARE
    * SPLICED INTO THE OUTPUT ("a1b".split(/(\d)/) → ["a","1","b"]), and a
    * separator match at position 0 yields a leading "". `limit` is
    * ToUint32 (undefined → 2^32-1). */
  def split(s: String, r: JsRegex, limitOpt: Option[Double]): mutable.ArrayBuffer[JsVal] = guardSOE {
    val out = mutable.ArrayBuffer.empty[JsVal]
    val lim: Long = limitOpt match {
      case None => 0xFFFFFFFFL
      case Some(d) if d.isNaN || d.isInfinite => 0L
      case Some(d) => d.toLong & 0xFFFFFFFFL
    }
    if (lim == 0L) return out
    val m = guardedMatcher(r, s)
    // attempt-at-position-q semantics (ES SplitMatch), not search-forward:
    m.useTransparentBounds(true)
    m.useAnchoringBounds(false)
    def matchAt(q: Int): Boolean = { m.region(q, s.length); m.lookingAt() }
    if (s.isEmpty) {
      if (!matchAt(0)) out += JsStr("")
      return out
    }
    var p = 0
    var q = 0
    while (q < s.length) {
      if (!matchAt(q)) q += 1
      else {
        val e = m.end
        if (e == p) q += 1
        else {
          out += JsStr(s.substring(p, q))
          if (out.length == lim) return out
          p = e
          var i = 1
          while (i <= m.groupCount) {
            out += (if (m.group(i) == null) JsUndef else JsStr(m.group(i)))
            if (out.length == lim) return out
            i += 1
          }
          q = p
        }
      }
    }
    out += JsStr(s.substring(p))
    out
  }

  // -------------------------------------------------------------- replace

  /** GetSubstitution (ES 22.1.3.17.1): `$$` `$&` `` $` `` `$'` `$n`/`$nn`;
    * an out-of-range `$n` stays literal. */
  def substitution(rep: String, matched: String, position: Int, s: String,
      groups: IndexedSeq[Option[String]]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < rep.length) {
      val c = rep.charAt(i)
      if (c == '$' && i + 1 < rep.length) {
        rep.charAt(i + 1) match {
          case '$' => sb.append('$'); i += 2
          case '&' => sb.append(matched); i += 2
          case '`' => sb.append(s.substring(0, position)); i += 2
          case '\'' => sb.append(s.substring(position + matched.length)); i += 2
          case d if d.isDigit =>
            val two =
              if (i + 2 < rep.length && rep.charAt(i + 2).isDigit)
                Some(rep.substring(i + 1, i + 3).toInt)
              else None
            two match {
              case Some(nn) if nn >= 1 && nn <= groups.length =>
                sb.append(groups(nn - 1).getOrElse("")); i += 3
              case _ =>
                val n = d - '0'
                if (n >= 1 && n <= groups.length) {
                  sb.append(groups(n - 1).getOrElse("")); i += 2
                } else { sb.append(c); i += 1 }
            }
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------- column entry points
  //
  // Static entry points for the column compiler's codegen'd regex
  // expressions (JsRegexColumns): SAME pattern cache, SAME guarded
  // matcher, SAME ES algorithms as the interpreter natives above, called
  // with a fresh regex per invocation — exactly a regex literal
  // evaluated per event (lastIndex starts at 0). A budget/SOE JsError
  // propagates and fails the task: compiled regex ops refuse to compile
  // inside `try`, so a JS-catchable error never becomes uncatchable.

  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.unsafe.types.UTF8String

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** match/exec result: null = no match; elements [full, g1, …] with
    * null for unmatched groups. Global regexes collect every full match
    * (String.prototype.match semantics). */
  def colMatch(s: UTF8String, pattern: String, flags: String): ArrayData = {
    val r = make(pattern, flags)
    matchStr(s.toString, r) match {
      case JsArr(items) =>
        new GenericArrayData(items.map {
          case JsStr(x) => utf8(x)
          case _ => null // JsUndef: unmatched group
        }.toArray[Any])
      case _ => null // JsNull: no match
    }
  }

  def colTest(s: UTF8String, pattern: String, flags: String): Boolean =
    test(make(pattern, flags), s.toString)

  def colReplace(s: UTF8String, rep: UTF8String, pattern: String,
      flags: String): UTF8String =
    utf8(replaceStr(s.toString, make(pattern, flags), rep.toString))

  /** ES split with capture splicing; JsUndef captures → null elements. */
  def colSplit(s: UTF8String, pattern: String, flags: String,
      hasLimit: Boolean, limit: Double): ArrayData = {
    val parts = split(s.toString, make(pattern, flags),
      if (hasLimit) Some(limit) else None)
    new GenericArrayData(parts.map {
      case JsStr(x) => utf8(x)
      case _ => null
    }.toArray[Any])
  }

  def colSearch(s: UTF8String, pattern: String, flags: String): Double =
    search(s.toString, make(pattern, flags))

  /** String.prototype.replace with a regex pattern and string replacement:
    * first match, or every match when `g` (which then resets lastIndex). */
  def replaceStr(s: String, r: JsRegex, rep: String): String =
    replaceWith(s, r, (m, _) => substitution(rep, m.group(0), m.start, s,
      (1 to m.groupCount).map(i => Option(m.group(i)))))

  /** Function replacement: `fn(matched, p1…, offset, whole) → ToString`. */
  def replaceFn(s: String, r: JsRegex, fn: Seq[JsVal] => JsVal): String =
    replaceWith(s, r, (m, _) => {
      val args = mutable.ArrayBuffer.empty[JsVal]
      args += JsStr(m.group(0))
      (1 to m.groupCount).foreach { i =>
        args += (if (m.group(i) == null) JsUndef else JsStr(m.group(i)))
      }
      args += JsNum(m.start.toDouble)
      args += JsStr(s)
      JsVal.toStr(fn(args.toSeq))
    })

  private def replaceWith(s: String, r: JsRegex,
      piece: (Matcher, Int) => String): String = guardSOE {
    val m = guardedMatcher(r, s)
    val sb = new StringBuilder
    var from = 0
    var last = 0
    var continue = true
    while (continue && from <= s.length && m.find(from)) {
      sb.append(s.substring(last, m.start))
      sb.append(piece(m, m.start))
      last = m.end
      from = if (m.end == m.start) m.end + 1 else m.end
      continue = r.global
    }
    sb.append(s.substring(last))
    if (r.global) r.lastIndex = 0
    sb.toString
  }
}
