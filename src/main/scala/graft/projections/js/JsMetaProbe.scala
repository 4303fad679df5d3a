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

  /** True iff `body` can observe a metadata-surface property of the
    * envelope bound to parameter name `env`. */
  def observes(env: String, body: Seq[Stmt]): Boolean = body.exists(stmt(env, _))

  private def stmt(env: String, s: Stmt): Boolean = s match {
    case VarDecl(decls) => decls.exists(_._2.exists(expr(env, _)))
    case ExprStmt(e) => expr(env, e)
    case If(c, t, el) =>
      expr(env, c) || t.exists(stmt(env, _)) || el.exists(_.exists(stmt(env, _)))
    case While(c, b) => expr(env, c) || b.exists(stmt(env, _))
    case DoWhile(c, b) => expr(env, c) || b.exists(stmt(env, _))
    case For(i, c, u, b) =>
      i.exists(stmt(env, _)) || c.exists(expr(env, _)) ||
        u.exists(expr(env, _)) || b.exists(stmt(env, _))
    // `for (k in e)` hands the envelope to enumeration — treat as escape
    case ForIn(_, o, b) => expr(env, o) || b.exists(stmt(env, _))
    case Return(e) => e.exists(expr(env, _))
    case Throw(e) => expr(env, e)
    case FuncDecl(_, params, b) =>
      if (params.contains(env)) false else b.exists(stmt(env, _))
    case TryStmt(b, catchParam, cb, fb) =>
      b.exists(stmt(env, _)) ||
        (!catchParam.contains(env) && cb.exists(_.exists(stmt(env, _)))) ||
        fb.exists(_.exists(stmt(env, _)))
    case Switch(d, cases) =>
      expr(env, d) || cases.exists { case (t, b) =>
        t.exists(expr(env, _)) || b.exists(stmt(env, _))
      }
    case BreakStmt | ContinueStmt => false
  }

  private def expr(env: String, e: Expr): Boolean = e match {
    case Member(Ident(`env`), p) => metaProps(p)
    case Index(Ident(`env`), StrLit(p)) => metaProps(p)
    case Index(Ident(`env`), NumLit(_)) => false
    case Index(Ident(`env`), _) => true // computed key — unknowable
    case Ident(`env`) => true // envelope escapes whole
    case Member(o, _) => expr(env, o)
    case Index(o, i) => expr(env, o) || expr(env, i)
    case Call(c, args) => expr(env, c) || args.exists(expr(env, _))
    case Unary(_, x) => expr(env, x)
    case Update(_, t, _) => expr(env, t)
    case Binary(_, l, r) => expr(env, l) || expr(env, r)
    case Logical(_, l, r) => expr(env, l) || expr(env, r)
    case Cond(c, t, f) => expr(env, c) || expr(env, t) || expr(env, f)
    case Assign(_, t, v) => expr(env, t) || expr(env, v)
    case ObjLit(fields) => fields.exists { case (_, v) => expr(env, v) }
    case ArrLit(items) => items.exists(expr(env, _))
    case FuncLit(params, b) =>
      if (params.contains(env)) false else b.exists(stmt(env, _))
    case _ => false
  }
}
