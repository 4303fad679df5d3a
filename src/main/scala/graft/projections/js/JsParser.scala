package graft.projections.js

import scala.collection.mutable.ArrayBuffer

// ----------------------------------------------------------------- AST
// Serializable case classes: compiled projection definitions ship to
// executors as source and re-parse per JVM, but ASTs may also ride in
// closures (e.g. a partition function) without ceremony.

sealed trait Stmt extends Serializable
final case class VarDecl(decls: Seq[(String, Option[Expr])]) extends Stmt
final case class ExprStmt(e: Expr) extends Stmt
final case class If(cond: Expr, thenS: Seq[Stmt], elseS: Option[Seq[Stmt]]) extends Stmt
final case class While(cond: Expr, body: Seq[Stmt]) extends Stmt
final case class DoWhile(cond: Expr, body: Seq[Stmt]) extends Stmt
final case class For(init: Option[Stmt], cond: Option[Expr], update: Option[Expr],
    body: Seq[Stmt]) extends Stmt
final case class ForIn(varName: String, obj: Expr, body: Seq[Stmt]) extends Stmt
final case class Return(e: Option[Expr]) extends Stmt
final case class Throw(e: Expr) extends Stmt
case object BreakStmt extends Stmt
case object ContinueStmt extends Stmt
final case class FuncDecl(name: String, params: Seq[String], body: Seq[Stmt]) extends Stmt
final case class TryStmt(body: Seq[Stmt], catchParam: Option[String],
    catchBody: Option[Seq[Stmt]], finallyBody: Option[Seq[Stmt]]) extends Stmt
/** `cases`: in source order; `None` test = the `default:` clause. */
final case class Switch(disc: Expr, cases: Seq[(Option[Expr], Seq[Stmt])]) extends Stmt

sealed trait Expr extends Serializable
final case class NumLit(d: Double) extends Expr
final case class StrLit(s: String) extends Expr
/** `/pattern/flags` — validated at parse time (ES throws regex literal
  * syntax errors early); evaluates to a fresh JsRegex per evaluation. */
final case class RegexLit(pattern: String, flags: String) extends Expr
final case class BoolLit(b: Boolean) extends Expr
case object NullLit extends Expr
case object UndefLit extends Expr
final case class Ident(name: String) extends Expr
final case class ObjLit(fields: Seq[(String, Expr)]) extends Expr
final case class ArrLit(items: Seq[Expr]) extends Expr
final case class FuncLit(params: Seq[String], body: Seq[Stmt]) extends Expr
final case class Member(obj: Expr, prop: String) extends Expr
final case class Index(obj: Expr, idx: Expr) extends Expr
final case class Call(callee: Expr, args: Seq[Expr]) extends Expr
final case class Unary(op: String, e: Expr) extends Expr
final case class Update(op: String, target: Expr, prefix: Boolean) extends Expr
final case class Binary(op: String, l: Expr, r: Expr) extends Expr
final case class Logical(op: String, l: Expr, r: Expr) extends Expr
final case class Cond(c: Expr, t: Expr, f: Expr) extends Expr
final case class Assign(op: String, target: Expr, value: Expr) extends Expr

final class JsParseError(msg: String) extends RuntimeException(msg)

// --------------------------------------------------------------- Lexer

private[js] final case class Tok(kind: String, text: String, pos: Int, line: Int)

private[js] object JsLexer {
  private val keywords = Set("function", "return", "var", "let", "const", "if",
    "else", "for", "while", "do", "true", "false", "null", "undefined",
    "typeof", "in", "new", "delete", "break", "continue", "throw", "this",
    "try", "catch", "finally", "switch", "case", "default")

  private val punct3 = Seq("===", "!==")
  private val punct2 = Seq("==", "!=", "<=", ">=", "&&", "||", "+=", "-=",
    "*=", "/=", "%=", "++", "--", "=>")
  private val punct1 = "(){}[];,.<>+-*/%!=?:&|"

  /** Token kinds after which a `/` must be division, not a regex literal —
    * the standard lexer heuristic (a value just ended). After anything
    * else (operators, `(`, `,`, keywords like `return`/`case`) a regex can
    * start. `}` counts as regex-allowed: statement-block ends dominate
    * handler code, and `({…}/2)` never appears in projection definitions.
    * `)` is usually value-position, EXCEPT when it closes an
    * `if`/`while`/`for`/`switch`/`catch` header — `if (cond) /\d/.test(s)`
    * is legal ES — so the tokenizer tracks paren nesting and marks those
    * closers regex-allowed. */
  private val noRegexAfter = Set("num", "str", "regex", "ident", ")", "]",
    "++", "--", "true", "false", "null", "undefined", "this")

  private val stmtHeadKeywords = Set("if", "while", "for", "switch", "catch")

  def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var prevKind: String = ""
    // true = the open-paren is an if/while/for/switch/catch header, whose
    // closer is statement position (a regex may follow it)
    var parens = List.empty[Boolean]
    def push(t: Tok): Unit = { out += t; prevKind = t.kind }
    var i = 0
    var line = 1
    def fail(msg: String) = throw new JsParseError(s"line $line: $msg")
    while (i < src.length) {
      val c = src.charAt(i)
      if (c == '\n') { line += 1; i += 1 }
      else if (c == ' ' || c == '\t' || c == '\r') i += 1
      else if (c == '/' && i + 1 < src.length && src.charAt(i + 1) == '/') {
        while (i < src.length && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < src.length && src.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < src.length && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) {
          if (src.charAt(i) == '\n') line += 1
          i += 1
        }
        if (i + 1 >= src.length) fail("unterminated block comment")
        i += 2
      } else if (c == '/' && !noRegexAfter(prevKind)) {
        // regex literal: body up to the unescaped closing '/' ('/' inside
        // a [...] class is literal), then flag letters
        val start = i
        i += 1
        val body = new StringBuilder
        var inClass = false
        var closed = false
        while (i < src.length && !closed) {
          val ch = src.charAt(i)
          if (ch == '\n') fail("unterminated regex literal")
          else if (ch == '\\') {
            if (i + 1 >= src.length) fail("unterminated regex literal")
            body.append(ch).append(src.charAt(i + 1))
            i += 2
          } else if (ch == '/' && !inClass) { closed = true; i += 1 }
          else {
            if (ch == '[') inClass = true
            else if (ch == ']') inClass = false
            body.append(ch)
            i += 1
          }
        }
        if (!closed) fail("unterminated regex literal")
        val flagStart = i
        while (i < src.length && src.charAt(i).isLetter) i += 1
        push(Tok("regex", body.toString + "\u0000" + src.substring(flagStart, i), start, line))
      } else if (c.isDigit || (c == '.' && i + 1 < src.length && src.charAt(i + 1).isDigit)) {
        val start = i
        while (i < src.length && (src.charAt(i).isDigit || src.charAt(i) == '.' ||
          src.charAt(i) == 'e' || src.charAt(i) == 'E' ||
          ((src.charAt(i) == '+' || src.charAt(i) == '-') && i > start &&
            (src.charAt(i - 1) == 'e' || src.charAt(i - 1) == 'E')))) i += 1
        push(Tok("num", src.substring(start, i), start, line))
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        val start = i
        i += 1
        while (i < src.length && src.charAt(i) != quote) {
          val ch = src.charAt(i)
          if (ch == '\\') {
            i += 1
            if (i >= src.length) fail("unterminated string")
            src.charAt(i) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
              case 'f' => sb.append('\f'); case '0' => sb.append('\u0000')
              case 'u' =>
                if (i + 4 >= src.length) fail("bad unicode escape")
                sb.append(Integer.parseInt(src.substring(i + 1, i + 5), 16).toChar)
                i += 4
              case other => sb.append(other) // \' \" \\ \/ and the rest verbatim
            }
            i += 1
          } else {
            if (ch == '\n') fail("unterminated string")
            sb.append(ch); i += 1
          }
        }
        if (i >= src.length) fail("unterminated string")
        i += 1
        push(Tok("str", sb.toString, start, line))
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < src.length && (src.charAt(i).isLetterOrDigit ||
          src.charAt(i) == '_' || src.charAt(i) == '$')) i += 1
        val word = src.substring(start, i)
        push(Tok(if (keywords(word)) word else "ident", word, start, line))
      } else {
        val rest = src.substring(i, math.min(i + 3, src.length))
        punct3.find(rest.startsWith) match {
          case Some(p) => push(Tok(p, p, i, line)); i += p.length
          case None => punct2.find(rest.startsWith) match {
            case Some(p) => push(Tok(p, p, i, line)); i += p.length
            case None =>
              if (punct1.indexOf(c) >= 0) {
                if (c == '(') parens = stmtHeadKeywords(prevKind) :: parens
                val stmtClose = c == ')' && parens.headOption.contains(true)
                if (c == ')' && parens.nonEmpty) parens = parens.tail
                push(Tok(c.toString, c.toString, i, line))
                // token kind stays ")" for the parser; only the lexer's
                // regex-vs-division state treats a header close as
                // statement position
                if (stmtClose) prevKind = "stmt-close"
                i += 1
              }
              else fail(s"unexpected character '$c'")
          }
        }
      }
    }
    out += Tok("eof", "", src.length, line)
    out.result()
  }
}

// -------------------------------------------------------------- Parser

/** Recursive-descent / Pratt parser for the JS subset projection
  * definitions use: expressions (incl. object/array/function literals,
  * member chains, calls), var/let/const, if/else, for, for-in, while,
  * return/throw/break/continue, function declarations, regex literals
  * (division-vs-regex disambiguated by the previous token — see
  * JsLexer.noRegexAfter). Semicolons are optional (pragmatic ASI: a
  * statement ends where the next one must begin). Not supported, by
  * design: classes, template strings, async, destructuring — none appear
  * in projection definitions. */
final class JsParser(src: String) {
  private val toks = JsLexer.tokenize(src)
  private var p = 0

  private def peek: Tok = toks(p)
  private def at(kind: String): Boolean = peek.kind == kind
  private def advance(): Tok = { val t = toks(p); p += 1; t }
  private def fail(msg: String): Nothing =
    throw new JsParseError(s"line ${peek.line}: $msg (got '${peek.text}')")
  private def expect(kind: String): Tok =
    if (at(kind)) advance() else fail(s"expected '$kind'")
  private def eat(kind: String): Boolean = { if (at(kind)) { p += 1; true } else false }

  def parseProgram(): Seq[Stmt] = {
    val out = ArrayBuffer.empty[Stmt]
    while (!at("eof")) out += parseStatement()
    out.toSeq
  }

  /** Parse a single expression (for tests / tooling). */
  def parseExpression(): Expr = {
    val e = expr()
    if (!at("eof") && !at(";")) fail("trailing input after expression")
    e
  }

  private def parseStatement(): Stmt = {
    val s = peek.kind match {
      case "var" | "let" | "const" => advance(); varDecl()
      case "if" => return ifStmt()
      case "while" => return whileStmt()
      case "do" =>
        advance()
        val body = stmtOrBlock()
        expect("while"); expect("(")
        val cond = expr()
        expect(")")
        eat(";")
        return DoWhile(cond, body)
      case "for" => return forStmt()
      case "try" => return tryStmt()
      case "switch" => return switchStmt()
      case "return" =>
        advance()
        if (at(";") || at("}") || at("eof")) Return(None) else Return(Some(expr()))
      case "throw" => advance(); Throw(expr())
      case "break" => advance(); BreakStmt
      case "continue" => advance(); ContinueStmt
      case "function" if toks(p + 1).kind == "ident" =>
        advance()
        val name = expect("ident").text
        val (params, body) = funcRest()
        FuncDecl(name, params, body)
      case "{" => return ExprStmt(blockAsExpr())
      case ";" => advance(); return ExprStmt(UndefLit)
      case _ => ExprStmt(expr())
    }
    eat(";")
    s
  }

  /** A bare `{ ... }` at statement position is a block; wrap it as an
    * immediately-evaluated sequence (no new scope subtleties needed for
    * projection code). */
  private def blockAsExpr(): Expr = {
    val body = block()
    Call(FuncLit(Nil, body), Nil)
  }

  private def varDecl(): Stmt = {
    val decls = ArrayBuffer.empty[(String, Option[Expr])]
    var more = true
    while (more) {
      val name = expect("ident").text
      val init = if (eat("=")) Some(assignExpr()) else None
      decls += ((name, init))
      more = eat(",")
    }
    VarDecl(decls.toSeq)
  }

  private def ifStmt(): Stmt = {
    expect("if"); expect("(")
    val cond = expr()
    expect(")")
    val thenS = stmtOrBlock()
    val elseS = if (eat("else")) Some(stmtOrBlock()) else None
    If(cond, thenS, elseS)
  }

  private def whileStmt(): Stmt = {
    expect("while"); expect("(")
    val cond = expr()
    expect(")")
    While(cond, stmtOrBlock())
  }

  private def forStmt(): Stmt = {
    expect("for"); expect("(")
    // for (var k in obj) / for (k in obj)
    val save = p
    val declared = at("var") || at("let") || at("const")
    if (declared) advance()
    if (at("ident") && toks(p + 1).kind == "in") {
      val name = advance().text
      expect("in")
      val obj = expr()
      expect(")")
      return ForIn(name, obj, stmtOrBlock())
    }
    p = save
    val init: Option[Stmt] =
      if (at(";")) { advance(); None }
      else {
        val s = if (at("var") || at("let") || at("const")) { advance(); varDecl() }
          else ExprStmt(expr())
        expect(";")
        Some(s)
      }
    val cond = if (at(";")) None else Some(expr())
    expect(";")
    val update = if (at(")")) None else Some(expr())
    expect(")")
    For(init, cond, update, stmtOrBlock())
  }

  private def tryStmt(): Stmt = {
    expect("try")
    val body = block()
    val (cParam, cBody) =
      if (eat("catch")) {
        // ES2019 optional catch binding: `catch {}` as well as `catch (e) {}`
        val param = if (eat("(")) { val n = expect("ident").text; expect(")"); Some(n) }
          else None
        (param, Some(block()))
      } else (None, None)
    val fBody = if (eat("finally")) Some(block()) else None
    if (cBody.isEmpty && fBody.isEmpty) fail("try requires catch or finally")
    TryStmt(body, cParam, cBody, fBody)
  }

  private def switchStmt(): Stmt = {
    expect("switch"); expect("(")
    val disc = expr()
    expect(")"); expect("{")
    val cases = ArrayBuffer.empty[(Option[Expr], Seq[Stmt])]
    while (!at("}") && !at("eof")) {
      val test = if (eat("case")) Some(expr())
        else { expect("default"); None }
      expect(":")
      val body = ArrayBuffer.empty[Stmt]
      while (!at("case") && !at("default") && !at("}") && !at("eof"))
        body += parseStatement()
      cases += ((test, body.toSeq))
    }
    expect("}")
    Switch(disc, cases.toSeq)
  }

  private def stmtOrBlock(): Seq[Stmt] =
    if (at("{")) block() else Seq(parseStatement())

  private def block(): Seq[Stmt] = {
    expect("{")
    val out = ArrayBuffer.empty[Stmt]
    while (!at("}") && !at("eof")) out += parseStatement()
    expect("}")
    out.toSeq
  }

  private def funcRest(): (Seq[String], Seq[Stmt]) = {
    expect("(")
    val params = ArrayBuffer.empty[String]
    if (!at(")")) {
      params += expect("ident").text
      while (eat(",")) params += expect("ident").text
    }
    expect(")")
    (params.toSeq, block())
  }

  // ------------------------------------------------- expression parsing

  private def expr(): Expr = {
    var e = assignExpr()
    while (eat(",")) e = assignExpr() // comma operator: value = last
    e
  }

  // Recursive-descent depth cap: a hostile definition like ((((…(1)…))))
  // with tens of thousands of parens would overflow the JVM stack during
  // COMPILE (an Error, not a parse failure). 200 nesting levels is far
  // beyond any legitimate projection; past it, fail with the same loud
  // JsParseError as any other malformed source.
  private var exprDepth = 0
  private def assignExpr(): Expr = {
    exprDepth += 1
    if (exprDepth > 200)
      throw new JsParseError(
        s"line ${peek.line}: expression nesting too deep (>200 levels)")
    try assignExprInner() finally exprDepth -= 1
  }

  private def assignExprInner(): Expr = {
    val left = condExpr()
    peek.kind match {
      case "=" | "+=" | "-=" | "*=" | "/=" | "%=" =>
        val op = advance().kind
        left match {
          case _: Ident | _: Member | _: Index => Assign(op, left, assignExpr())
          case _ => fail("invalid assignment target")
        }
      case _ => left
    }
  }

  private def condExpr(): Expr = {
    val c = orExpr()
    if (eat("?")) {
      val t = assignExpr()
      expect(":")
      Cond(c, t, assignExpr())
    } else c
  }

  private def orExpr(): Expr = {
    var l = andExpr()
    while (at("||")) { advance(); l = Logical("||", l, andExpr()) }
    l
  }

  private def andExpr(): Expr = {
    var l = eqExpr()
    while (at("&&")) { advance(); l = Logical("&&", l, eqExpr()) }
    l
  }

  private def eqExpr(): Expr = {
    var l = relExpr()
    while (at("==") || at("!=") || at("===") || at("!==")) {
      val op = advance().kind
      l = Binary(op, l, relExpr())
    }
    l
  }

  private def relExpr(): Expr = {
    var l = addExpr()
    while (at("<") || at(">") || at("<=") || at(">=") || at("in")) {
      val op = advance().kind
      l = Binary(op, l, addExpr())
    }
    l
  }

  private def addExpr(): Expr = {
    var l = mulExpr()
    while (at("+") || at("-")) {
      val op = advance().kind
      l = Binary(op, l, mulExpr())
    }
    l
  }

  private def mulExpr(): Expr = {
    var l = unaryExpr()
    while (at("*") || at("/") || at("%")) {
      val op = advance().kind
      l = Binary(op, l, unaryExpr())
    }
    l
  }

  private def unaryExpr(): Expr = peek.kind match {
    case "!" | "-" | "+" => Unary(advance().kind, unaryExpr())
    case "typeof" => advance(); Unary("typeof", unaryExpr())
    case "delete" => advance(); Unary("delete", unaryExpr())
    case "++" | "--" =>
      val op = advance().kind
      Update(op, unaryExpr(), prefix = true)
    case "new" =>
      advance() // `new X(...)` treated as a plain call of X
      unaryExpr()
    case _ => postfixExpr()
  }

  private def postfixExpr(): Expr = {
    var e = callMember(primary())
    while (at("++") || at("--")) e = Update(advance().kind, e, prefix = false)
    e
  }

  private def callMember(base: Expr): Expr = {
    var e = base
    var more = true
    while (more) {
      if (eat(".")) {
        val t = advance()
        if (t.kind != "ident" && !t.text.forall(ch => ch.isLetterOrDigit || ch == '_' || ch == '$'))
          fail("expected property name")
        e = Member(e, t.text)
      } else if (eat("[")) {
        val idx = expr()
        expect("]")
        e = Index(e, idx)
      } else if (at("(")) {
        advance()
        val args = ArrayBuffer.empty[Expr]
        if (!at(")")) {
          args += assignExpr()
          while (eat(",")) args += assignExpr()
        }
        expect(")")
        e = Call(e, args.toSeq)
      } else more = false
    }
    e
  }

  private def primary(): Expr = peek.kind match {
    case "num" => NumLit(advance().text.toDouble)
    case "str" => StrLit(advance().text)
    case "regex" =>
      val t = advance()
      val sep = t.text.indexOf('\u0000')
      val (pat, flags) = (t.text.substring(0, sep), t.text.substring(sep + 1))
      // parse-time validation (and warms the Pattern cache) — a bad
      // literal is a syntax error, as in ES
      try JsRegexOps.compile(pat, flags)
      catch { case e: JsError => throw new JsParseError(s"line ${t.line}: ${e.getMessage}") }
      RegexLit(pat, flags)
    case "true" => advance(); BoolLit(true)
    case "false" => advance(); BoolLit(false)
    case "null" => advance(); NullLit
    case "undefined" => advance(); UndefLit
    case "ident" => Ident(advance().text)
    case "this" => advance(); Ident("this")
    case "function" =>
      advance()
      if (at("ident")) advance() // named function expressions: name ignored
      val (params, body) = funcRest()
      FuncLit(params, body)
    case "(" =>
      advance()
      val e = expr()
      expect(")")
      e
    case "[" =>
      advance()
      val items = ArrayBuffer.empty[Expr]
      if (!at("]")) {
        items += assignExpr()
        while (eat(",")) if (!at("]")) items += assignExpr()
      }
      expect("]")
      ArrLit(items.toSeq)
    case "{" =>
      advance()
      val fields = ArrayBuffer.empty[(String, Expr)]
      if (!at("}")) {
        var more = true
        while (more) {
          val key = peek.kind match {
            case "str" | "num" | "ident" => advance().text
            case k if JsParser.keywordKeys(k) => advance().text
            case _ => fail("expected property key")
          }
          expect(":")
          fields += ((key, assignExpr()))
          more = eat(",") && !at("}")
        }
      }
      expect("}")
      ObjLit(fields.toSeq)
    case _ => fail("expected expression")
  }
}

object JsParser {
  private[js] val keywordKeys = Set("function", "return", "var", "let", "const",
    "if", "else", "for", "while", "do", "true", "false", "null", "undefined",
    "typeof", "in", "new", "delete", "break", "continue", "throw", "this",
    "try", "catch", "finally", "switch", "case", "default")

  def program(src: String): Seq[Stmt] = new JsParser(src).parseProgram()
}
