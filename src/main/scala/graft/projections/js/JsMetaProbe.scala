package graft.projections.js

/** AST-based detection of whether a projection definition can observe the
  * envelope's metadata surface — the properties that only exist when the
  * scan is widened to `event_id`/`metadata`/`link_metadata`
  * (JintProjectionStateHandler.cs:827-838 envelope: eventId, metadataRaw,
  * linkMetadataRaw and their parsed forms).
  *
  * Replaces the earlier source-text `contains("metadata")` probe: a walk
  * of the already-built handler ASTs, scoped to the IDENTIFIER bound to
  * the envelope in each handler, so a string literal containing the word
  * "metadata" or a `state.metadata` field no longer widens the scan.
  *
  * Errs only in the widening direction (false positive = wider scan,
  * never a silently-null metadata):
  *  - a literal access `e.metadata` / `e["eventId"]` to a meta property
  *    widens; `e.body.metadata` (a key inside the DATA json) does not;
  *  - a computed access with a non-literal key (`e[k]`) widens — the key
  *    is unknowable statically;
  *  - the envelope value escaping whole (passed to a function, assigned,
  *    returned, iterated with for-in, closed over by a nested function
  *    that shadows nothing) widens — whatever receives it may look;
  *  - an inner function re-binding the name drops tracking for its body.
  */
private[js] object JsMetaProbe {

  private val metaProps =
    Set("metadata", "metadataRaw", "linkMetadata", "linkMetadataRaw", "eventId")

  /** The parsed-body surface: the properties whose presence forces the
    * per-event JSON parse of `data`. When no handler can observe any of
    * them, `envelope()` skips the parse entirely — the batch analog of the
    * reference's lazy body parse (JintProjectionStateHandler.cs:868-880). */
  private[js] val bodyProps = Set("body", "data", "isJson")

  /** True iff `body` can observe a metadata-surface property of the
    * envelope bound to parameter name `env`. */
  def observes(env: String, body: Seq[Stmt]): Boolean =
    observesAny(env, body, metaProps)

  /** True iff `body` can observe any of `props` on the envelope bound to
    * `env` — same widening rules (computed keys, whole-envelope escapes,
    * for-in all widen; shadowing drops tracking). */
  def observesAny(env: String, body: Seq[Stmt], props: Set[String]): Boolean =
    body.exists(stmt(env, _, props))

  private def stmt(env: String, s: Stmt, props: Set[String]): Boolean = s match {
    case VarDecl(decls) => decls.exists(_._2.exists(expr(env, _, props)))
    case ExprStmt(e) => expr(env, e, props)
    case If(c, t, el) =>
      expr(env, c, props) || t.exists(stmt(env, _, props)) ||
        el.exists(_.exists(stmt(env, _, props)))
    case While(c, b) => expr(env, c, props) || b.exists(stmt(env, _, props))
    case DoWhile(c, b) => expr(env, c, props) || b.exists(stmt(env, _, props))
    case For(i, c, u, b) =>
      i.exists(stmt(env, _, props)) || c.exists(expr(env, _, props)) ||
        u.exists(expr(env, _, props)) || b.exists(stmt(env, _, props))
    // `for (k in e)` hands the envelope to enumeration — treat as escape
    case ForIn(_, o, b) => expr(env, o, props) || b.exists(stmt(env, _, props))
    case Return(e) => e.exists(expr(env, _, props))
    case Throw(e) => expr(env, e, props)
    case FuncDecl(_, params, b) =>
      if (params.contains(env)) false else b.exists(stmt(env, _, props))
    case TryStmt(b, catchParam, cb, fb) =>
      b.exists(stmt(env, _, props)) ||
        (!catchParam.contains(env) && cb.exists(_.exists(stmt(env, _, props)))) ||
        fb.exists(_.exists(stmt(env, _, props)))
    case Switch(d, cases) =>
      expr(env, d, props) || cases.exists { case (t, b) =>
        t.exists(expr(env, _, props)) || b.exists(stmt(env, _, props))
      }
    case BreakStmt | ContinueStmt => false
  }

  private def expr(env: String, e: Expr, props: Set[String]): Boolean = e match {
    case Member(Ident(`env`), p) => props(p)
    case Index(Ident(`env`), StrLit(p)) => props(p)
    case Index(Ident(`env`), NumLit(_)) => false
    case Index(Ident(`env`), _) => true // computed key — unknowable
    case Ident(`env`) => true // envelope escapes whole
    case Member(o, _) => expr(env, o, props)
    case Index(o, i) => expr(env, o, props) || expr(env, i, props)
    case Call(c, args) => expr(env, c, props) || args.exists(expr(env, _, props))
    case Unary(_, x) => expr(env, x, props)
    case Update(_, t, _) => expr(env, t, props)
    case Binary(_, l, r) => expr(env, l, props) || expr(env, r, props)
    case Logical(_, l, r) => expr(env, l, props) || expr(env, r, props)
    case Cond(c, t, f) =>
      expr(env, c, props) || expr(env, t, props) || expr(env, f, props)
    case Assign(_, t, v) => expr(env, t, props) || expr(env, v, props)
    case ObjLit(fields) => fields.exists { case (_, v) => expr(env, v, props) }
    case ArrLit(items) => items.exists(expr(env, _, props))
    case FuncLit(params, b) =>
      if (params.contains(env)) false else b.exists(stmt(env, _, props))
    case _ => false
  }
}
