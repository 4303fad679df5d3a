package graft.projections.js

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.sources.Tables

/** Correctness-gate queries for JS projection definitions: each runs a
  * REAL JS source through the interpreter + FoldBuilder and must match the
  * same DuckDB oracle as its Scala-DSL sibling — proving the JS surface
  * computes identical results, not just that it parses.
  *
  * Handlers accumulate money in integer cents (all integral doubles —
  * exact in IEEE well past corpus scale), mirroring ProjectionQueries. */
object JsProjectionQueries extends QueryModule {

  private def log(s: SparkSession, d: String): DataFrame = Tables.eventLog(s, d)

  /** js sibling of p5_fold_count_sum. */
  private val foldSource = """
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

  private def jsFold(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(foldSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        get_json_object(col("state"), "$.cents").cast("long").as("sum_cents"))
      .orderBy(col("partition"))

  /** js sibling of p6_partition_by (body-derived partition key). */
  private val partitionSource = """
fromAll()
    .partitionBy(function(e) {
        return e.body && e.body.k != null ? e.body.k : null;
    })
    .when({
        $init: function() { return { n: 0, cents: 0 } },
        $any: function(s, e) {
            s.n += 1;
            s.cents += Math.round(e.value * 100);
            return s;
        }
    })"""

  private def jsPartitionBy(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(partitionSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        get_json_object(col("state"), "$.cents").cast("long").as("sum_cents"))
      .orderBy(col("partition"))

  /** js dynamic-key counter object (count-by-type per correlation key) —
    * the canonical per-property tally shape. Compiles to the r8 two-level
    * map aggregation: level 1 groups by (partition, type), level 2
    * reassembles the object in insertion order; no interpreter fold. */
  private val countByTypeSource = """
fromAll()
    .partitionBy(function(e) {
        return e.body && e.body.k != null ? e.body.k : null;
    })
    .when({
        $init: function() { return { n: 0, by_type: {} } },
        $any: function(s, e) {
            s.n += 1;
            s.by_type[e.eventType] = (s.by_type[e.eventType] || 0) + 1;
            return s;
        }
    })"""

  private def jsCountByType(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    JsProjection.compile(countByTypeSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        explode(from_json(get_json_object(col("state"), "$.by_type"),
          MapType(StringType, LongType))).as(Seq("etype", "cnt")))
      .orderBy(col("partition"), col("etype"))
  }

  /** js dynamic-key overwrite object (last value per event type, per
    * correlation key) — last-write-wins maps via the same two-level plan,
    * values selected by max log position instead of summed. */
  private val lastByTypeSource = """
fromAll()
    .partitionBy(function(e) {
        return e.body && e.body.k != null ? e.body.k : null;
    })
    .when({
        $init: function() { return { last_cents: {} } },
        $any: function(s, e) {
            s.last_cents[e.eventType] = Math.round(e.value * 100);
            return s;
        }
    })"""

  private def jsLastByType(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    JsProjection.compile(lastByTypeSource).states(log(s, d))
      .select(col("partition"),
        explode(from_json(get_json_object(col("state"), "$.last_cents"),
          MapType(StringType, LongType))).as(Seq("etype", "last_cents")))
      .orderBy(col("partition"), col("etype"))
  }

  /** js dynamic-key MAP pre-state reads (r12): handlers gating on map
    * state — `if (s.seen[e.k])` membership and `if ((s.seen[e.k]||0) >=
    * t)` threshold guards — compile to a window over the fold-order-
    * preceding rows of (partition, key), the same two-level key the map
    * aggregation groups by. repeat_cents sums cents of every event whose
    * type already appeared under the correlation key; bursts counts
    * third-or-later occurrences. */
  private val mapGuardSource = """
fromAll()
    .partitionBy(function(e) {
        return e.body && e.body.k != null ? e.body.k : null;
    })
    .when({
        $init: function() { return { seen: {}, repeat_cents: 0, bursts: 0 } },
        $any: function(s, e) {
            if (s.seen[e.eventType]) { s.repeat_cents += Math.round(e.value * 100); }
            if ((s.seen[e.eventType] || 0) >= 2) { s.bursts += 1; }
            s.seen[e.eventType] = (s.seen[e.eventType] || 0) + 1;
            return s;
        }
    })"""

  private def jsMapGuard(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    JsProjection.compile(mapGuardSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.repeat_cents").cast("long").as("repeat_cents"),
        get_json_object(col("state"), "$.bursts").cast("long").as("bursts"),
        explode(from_json(get_json_object(col("state"), "$.seen"),
          MapType(StringType, LongType))).as(Seq("etype", "cnt")))
      .orderBy(col("partition"), col("etype"))
  }

  /** js ARRAY pre-state reads (r13): handlers gating on array state —
    * `s.types.includes(V)` membership, `s.types.length >= k`, and the
    * self-deduplicating `if (s.types.indexOf(V) === -1) s.types.push(V)`
    * idiom. Membership compiles to a count-of-preceding-offers window
    * over (partition, value); length to a running count over the shared
    * partition window; the distinct-type list itself stays the ordinary
    * push fold. `types` accumulates DISTINCT event types in first-seen
    * order per correlation key; repeat_cents sums cents of events whose
    * type already appeared; breadth2 counts events arriving once ≥2
    * distinct types were already seen. */
  private val arrayGuardSource = """
fromAll()
    .partitionBy(function(e) {
        return e.body && e.body.k != null ? e.body.k : null;
    })
    .when({
        $init: function() { return { types: [], repeat_cents: 0, breadth2: 0 } },
        $any: function(s, e) {
            if (s.types.includes(e.eventType)) { s.repeat_cents += Math.round(e.value * 100); }
            if (s.types.length >= 2) { s.breadth2 += 1; }
            if (s.types.indexOf(e.eventType) === -1) { s.types.push(e.eventType); }
            return s;
        }
    })"""

  private def jsArrayGuard(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(arrayGuardSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.repeat_cents").cast("long").as("repeat_cents"),
        get_json_object(col("state"), "$.breadth2").cast("long").as("breadth2"),
        get_json_object(col("state"), "$.types").as("types"))
      .orderBy(col("partition"))

  /** Corpus-only sibling: a pre-state read of an OVERWRITE map (latest
    * preceding per-key value; undefined before the first write, so the
    * first occurrence's comparison is false like the interpreter's
    * NaN-compare). Equivalence-swept by JsEngineSpec; no oracle. */
  private[js] val mapLastGuardSource = """
fromAll()
    .partitionBy(function(e) {
        return e.body && e.body.k != null ? e.body.k : null;
    })
    .when({
        $init: function() { return { last_cents: {}, drops: 0 } },
        $any: function(s, e) {
            var c = Math.round(e.value * 100);
            if (c < s.last_cents[e.eventType]) { s.drops += 1; }
            s.last_cents[e.eventType] = c;
            return s;
        }
    })"""

  /** js sibling of p13_emit (conditional emit with an object body). */
  private val emitSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        purchase: function(s, e) {
            if (e.value > 150.0)
                emit("receipt-" + e.streamId.split("-")[1], "ReceiptIssued",
                     { cents: Math.round(e.value * 100) });
        }
    })"""

  private def jsEmit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    JsProjection.compile(emitSource).emitted(log(s, d))
      .toDF()
      .select(col("stream_id"), col("event_type"), col("data"),
        col("partition"), col("caused_by_position"))
      .orderBy(col("caused_by_position"))
  }

  /** STATEFUL emit — the running-aggregate-notification idiom: the
    * handler folds state, then emits a value computed FROM that state
    * under a state-derived guard. Compiles via the states() plan's
    * per-row frame with POST-state window columns (r15): `s.n`/`s.cents`
    * read after their same-handler mutations resolve to inclusive
    * windows; no interpreter, no serial fold. */
  private val emitStatefulSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { n: 0, cents: 0 } },
        purchase: function(s, e) {
            s.n += 1;
            s.cents += Math.round(e.value * 100);
            if (s.n % 5 === 0)
                emit("milestone-" + e.streamId, "Milestone",
                     { n: s.n, total: s.cents });
        }
    })"""

  private def jsEmitStateful(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    JsProjection.compile(emitStatefulSource).emitted(log(s, d))
      .toDF()
      .select(col("stream_id"), col("event_type"), col("data"),
        col("partition"), col("caused_by_position"))
      .orderBy(col("caused_by_position"))
  }

  /** js linkTo over correlation ids — `$>` links with "n@stream" bodies.
    * partitionBy keeps the fold parallel (one serial pump per correlation
    * key, not one for the whole log). */
  private val linkSource = """
fromAll()
    .partitionBy(function(e) {
        return e.body && e.body.k != null ? e.body.k : null;
    })
    .when({
        $any: function(s, e) {
            linkTo("corr-" + e.body.k, e);
        }
    })"""

  private def jsLinkTo(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    JsProjection.compile(linkSource).emitted(log(s, d))
      .toDF()
      .select(col("stream_id"), col("event_type"), col("data"),
        col("caused_by_position"))
      .orderBy(col("caused_by_position"))
  }

  /** js sibling of p9_p10_transform_filter (filterBy + transformBy). */
  private val transformSource = """
fromCategory("error")
    .foreachStream()
    .when({
        $init: function() { return { n: 0, cents: 0 } },
        $any: function(s, e) {
            s.n += 1;
            s.cents += Math.round(e.value * 100);
            return s;
        }
    })
    .filterBy(function(s) { return s.n >= 5; })
    .transformBy(function(s) { return { n: s.n, avg: s.cents / 100.0 / s.n }; })"""

  private def jsTransformFilter(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(transformSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        get_json_object(col("state"), "$.avg").cast("double").as("avg_value"))
      .orderBy(col("partition"))

  /** js sibling of p8_output_state (result events, reference naming). */
  private val outputSource = """
fromCategory("click")
    .foreachStream()
    .when({
        $init: function() { return { n: 0, cents: 0 } },
        click: function(s, e) {
            s.n += 1;
            s.cents += Math.round(e.value * 100);
            return s;
        }
    })"""

  private def jsOutputState(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(outputSource).outputState(log(s, d), "jsclicks")
      .orderBy(col("partition"))

  /** switch-on-eventType + try/catch — the two constructs real Jint-era
    * handlers lean on (switch over event types; try/catch around JSON
    * access). The catch path is exercised deterministically: events
    * without a `k` body property throw "cannot read property 'length' of
    * undefined", which the handler catches and counts. */
  private val trySwitchSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { cents: 0, big: 0, k_len: 0, no_k: 0 }; },
        purchase: function(s, e) {
            switch (e.eventType) {
                case 'refund':
                    s.cents -= Math.round(e.value * 100);
                    break;
                case 'purchase':
                    s.cents += Math.round(e.value * 100);
                    if (e.value > 150.0) s.big += 1;
                    break;
                default:
                    throw new Error('unexpected type ' + e.eventType);
            }
            try {
                if (e.body.k === undefined) throw new RangeError('no k');
                s.k_len += String(e.body.k).length;
            } catch (err) {
                s.no_k += 1;
            }
            return s;
        }
    })"""

  private def jsTrySwitch(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(trySwitchSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.cents").cast("long").as("cents"),
        get_json_object(col("state"), "$.big").cast("long").as("big"),
        get_json_object(col("state"), "$.k_len").cast("long").as("k_len"),
        get_json_object(col("state"), "$.no_k").cast("long").as("no_k"))
      .orderBy(col("partition"))

  /** Regex in handlers — match (capture extraction), test, regex replace
    * with `g`, and regex split, each mirrored by a DuckDB regexp_*
    * function in the oracle. The forms Jint-era handlers actually use
    * (JintProjectionStateHandler.cs handlers run arbitrary ES; regexes
    * are deterministic so the Date/random replay ban does not apply). */
  private val regexSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { parts: 0, id_sum: 0, two_digit: 0, masked: '' }; },
        purchase: function(s, e) {
            var m = e.streamId.match(/(\d+)/);
            if (m !== null) s.id_sum += Number(m[0]);
            if (/\d\d/.test(e.streamId)) s.two_digit += 1;
            s.masked = e.streamId.replace(/\d/g, '#');
            s.parts += e.streamId.split(/-/).length;
            return s;
        }
    })"""

  private def jsRegexExtract(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(regexSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.parts").cast("long").as("parts"),
        get_json_object(col("state"), "$.id_sum").cast("long").as("id_sum"),
        get_json_object(col("state"), "$.two_digit").cast("long").as("two_digit"),
        get_json_object(col("state"), "$.masked").as("masked"))
      .orderBy(col("partition"))

  /** Time bucketing with argument-constructed Date — the classic
    * Jint-era handler shape (`new Date(e.timestamp).getUTCHours()` style),
    * deterministic because every Date is a pure function of event data
    * (JsDateOps). Exercises the constructor, Date.parse, toISOString,
    * getUTCDay and getTime against DuckDB's calendar functions. */
  private val dateSource = """
var epoch = Date.parse('2020-01-01T00:00:00Z');
fromAll()
    .partitionBy(function(e) {
        return new Date(e.timestamp).toISOString().slice(0, 13);
    })
    .when({
        $init: function() { return { n: 0, dow: 0, days: 0 }; },
        $any: function(s, e) {
            var d = new Date(e.timestamp);
            s.n += 1;
            s.dow += d.getUTCDay();
            s.days += Math.floor((d.getTime() - epoch) / 86400000);
            return s;
        }
    })"""

  private def jsDateBucket(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(dateSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        get_json_object(col("state"), "$.dow").cast("long").as("dow_sum"),
        get_json_object(col("state"), "$.days").cast("long").as("day_sum"))
      .orderBy(col("partition"))

  /** Running extrema — the `s.f = Math.max(s.f, …)` shape the column
    * compiler turns into max/min aggregates (selection ops, exact on
    * doubles, no integrality needed). Oracle-proven against DuckDB
    * max/min so the compiled aggregation is covered by the official
    * gate, not just the in-repo equivalence suite. */
  private val minmaxSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { n: 0, hi: -1e308, lo: 1e308 }; },
        purchase: function(s, e) {
            s.n += 1;
            s.hi = Math.max(s.hi, Math.round(e.value * 100));
            s.lo = Math.min(Math.round(e.value * 100), s.lo);
            return s;
        }
    })"""

  private def jsMinMax(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(minmaxSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        get_json_object(col("state"), "$.hi").cast("long").as("hi_cents"),
        get_json_object(col("state"), "$.lo").cast("long").as("lo_cents"))
      .orderBy(col("partition"))

  /** Last-write overwrites (`s.f = expr`): the compiled plan keeps the
    * latest executed assignment per field via max-by-log-position, with
    * guarded sites, a typed string field, a Date field, and `s.n++`. */
  private val lastValueSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { n: 0, status: "new",
                                     lastCents: null, lastAt: undefined }; },
        purchase: function(s, e) {
            s.n++;
            s.lastCents = Math.round(e.value * 100);
            if (e.value > 150) { s.status = "big"; } else { s.status = "small"; }
            var d = new Date(e.timestamp);
            s.lastAt = d;
            return s;
        }
    })"""

  private def jsLastValue(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(lastValueSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        get_json_object(col("state"), "$.status").as("status"),
        get_json_object(col("state"), "$.lastCents").cast("long").as("last_cents"),
        get_json_object(col("state"), "$.lastAt").as("last_at"))
      .orderBy(col("partition"))

  /** The string-operation surface in one handler — parseInt on a regex-
    * split segment, Java-trim + toLowerCase over a coerced raw body,
    * `includes`, JSON.stringify — each mirrored by the DuckDB
    * equivalent. The engine's `.trim` is Java String.trim (every char
    * ≤ U+0020), which the handler exercises by padding with tab/newline
    * before trimming. */
  private val stringOpsSource = """
fromCategory('signup')
    .foreachStream()
    .when({
        $init: function() { return { users: 0, kid: 0, clean: '', flag: 0, j: '' }; },
        signup: function(s, e) {
            s.users += 1;
            s.kid += parseInt(e.streamId.split(/-/)[1]);
            s.clean = ('\t ' + e.bodyRaw + ' \n').trim().toLowerCase();
            if ((e.bodyRaw + '').includes('"k"')) s.flag += 1;
            s.j = JSON.stringify(e.eventType);
            return s;
        }
    })"""

  private def jsStringOps(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(stringOpsSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.users").cast("long").as("users"),
        get_json_object(col("state"), "$.kid").cast("long").as("kid"),
        get_json_object(col("state"), "$.clean").as("clean"),
        get_json_object(col("state"), "$.flag").cast("long").as("flag"),
        get_json_object(col("state"), "$.j").as("j"))
      .orderBy(col("partition"))

  /** Arrays-in-state: guarded `s.big.push(...)` alongside a sum — the
    * compiled fold collect_lists (log_position, elements) and restores
    * order with array_sort at finalization, so the plan stays one
    * scan + one aggregate with no interpreter node and no ordered fold. */
  private val arrayCollectSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { n: 0, big: [] }; },
        purchase: function(s, e) {
            s.n += 1;
            if (e.value > 150.0) s.big.push(Math.round(e.value * 100));
            return s;
        }
    })"""

  private def jsArrayCollect(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(arrayCollectSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        get_json_object(col("state"), "$.big").as("big"))
      .orderBy(col("partition"))

  /** Early-return filter idiom (r8 compiled shape): small purchases
    * short-circuit the handler; the rest fold count + cents. */
  private val earlyReturnSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { small: 0, n: 0, cents: 0 } },
        $any: function(s, e) {
            if (e.value < 50) { s.small += 1; return s; }
            s.n += 1;
            s.cents += Math.round(e.value * 100);
            return s;
        }
    })"""

  private def jsEarlyReturn(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(earlyReturnSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.small").cast("long").as("small"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        get_json_object(col("state"), "$.cents").cast("long").as("cents"))
      .orderBy(col("partition"))

  /** Nested-state fold (r8 compiled shape): counters and extrema live in
    * SUBTREES of the state object; an untouched sibling ('kind') must
    * render verbatim in place. */
  private val nestedStateSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { meta: { kind: 'agg', n: 0 },
                                     money: { cents: 0, hi: 0 } } },
        $any: function(s, e) {
            s.meta.n += 1;
            s.money.cents += Math.round(e.value * 100);
            s.money.hi = Math.max(s.money.hi, Math.round(e.value * 100));
            return s;
        }
    })"""

  private def jsNestedState(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(nestedStateSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.meta.kind").as("kind"),
        get_json_object(col("state"), "$.meta.n").cast("long").as("n"),
        get_json_object(col("state"), "$.money.cents").cast("long").as("cents"),
        get_json_object(col("state"), "$.money.hi").cast("long").as("hi"))
      .orderBy(col("partition"))

  /** String-concat accumulator (r8 compiled shape): the audit-trail
    * idiom — append one token per event, final value in log order. */
  private val stringAccumSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { n: 0, trail: '' } },
        $any: function(s, e) {
            s.n += 1;
            s.trail += e.eventType + ';';
            return s;
        }
    })"""

  private def jsStringAccum(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(stringAccumSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        get_json_object(col("state"), "$.trail").as("trail"))
      .orderBy(col("partition"))

  /** fromStreamsMatching (r9): regex stream-set predicate selector —
    * compiles to a Catalyst rlike filter ahead of the fold. */
  private val streamsMatchingSource = """
fromStreamsMatching(function(sid) { return /^purchase-1[0-9]$/.test(sid); })
    .foreachStream()
    .when({
        $init: function() { return { n: 0, cents: 0 } },
        $any: function(s, e) {
            s.n += 1;
            s.cents += Math.round(e.value * 100);
            return s;
        }
    })"""

  private def jsStreamsMatching(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(streamsMatchingSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.n").cast("long").as("n"),
        get_json_object(col("state"), "$.cents").cast("long").as("sum_cents"))
      .orderBy(col("partition"))

  /** if/else with `return s` in BOTH branches (r9 compiled shape),
    * mixing an extremum in one branch with a counter + string PREPEND
    * in the other — each mutation runs under its branch condition. */
  private val branchFoldSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { hi: 0, small: 0, trail: '' } },
        $any: function(s, e) {
            if (e.value >= 50) {
                s.hi = Math.max(s.hi, Math.round(e.value * 100));
                return s;
            } else {
                s.small += 1;
                s.trail = e.eventType + '|' + s.trail;
                return s;
            }
        }
    })"""

  private def jsBranchFold(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(branchFoldSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.hi").cast("long").as("hi_cents"),
        get_json_object(col("state"), "$.small").cast("long").as("small"),
        get_json_object(col("state"), "$.trail").as("trail"))
      .orderBy(col("partition"))

  /** Pre-state read guard (r10 compiled shape): the ubiquitous
    * first-event check — `if (s.count === 0)` routes the first purchase's
    * cents to one field and every later purchase's to another. Compiles
    * to a fold-order running-sum window feeding ordinary guarded sums;
    * no interpreter anywhere in the plan. */
  private val firstEventSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { count: 0, first_cents: 0, later_cents: 0 } },
        purchase: function(s, e) {
            if (s.count === 0) { s.first_cents += Math.round(e.value * 100); }
            else { s.later_cents += Math.round(e.value * 100); }
            s.count += 1;
            return s;
        }
    })"""

  private def jsFirstEvent(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(firstEventSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.count").cast("long").as("n"),
        get_json_object(col("state"), "$.first_cents").cast("long").as("first_cents"),
        get_json_object(col("state"), "$.later_cents").cast("long").as("later_cents"))
      .orderBy(col("partition"))

  /** Non-sum pre-state reads (r11 compiled shape): a high-water-mark
    * counter (`if (cents > s.peak)` reads the RUNNING MAX before its own
    * Math.max mutation), a consecutive-same-type counter (`if (s.last ===
    * e.eventType)` reads the latest PRECEDING overwrite), and a running
    * minimum via the guard recurrence `if (cents < s.low) s.low = cents`
    * seeded from Infinity (compiled as a selection aggregate — no read,
    * no window). All interpreter-free; the two reads compile to
    * fold-key-partitioned windows. */
  private val highWaterSource = """
fromCategory("purchase")
    .foreachStream()
    .when({
        $init: function() { return { peak: 0, rises: 0, last: '', repeats: 0, low: Infinity } },
        $any: function(s, e) {
            var cents = Math.round(e.value * 100);
            if (cents > s.peak) { s.rises += 1; }
            s.peak = Math.max(s.peak, cents);
            if (s.last === e.eventType) { s.repeats += 1; }
            s.last = e.eventType;
            if (cents < s.low) s.low = cents;
            return s;
        }
    })"""

  private def jsHighWater(s: SparkSession, d: String): DataFrame =
    JsProjection.compile(highWaterSource).states(log(s, d))
      .select(col("partition"),
        get_json_object(col("state"), "$.peak").cast("long").as("peak_cents"),
        get_json_object(col("state"), "$.rises").cast("long").as("rises"),
        get_json_object(col("state"), "$.repeats").cast("long").as("repeats"),
        get_json_object(col("state"), "$.low").cast("long").as("low_cents"))
      .orderBy(col("partition"))

  /** Every JS definition this module runs, by name — the handler corpus
    * the JsEngineSpec column-compiler equivalence suite sweeps (fast path
    * == interpreter on each, including the ones that must fall back). */
  private[graft] def handlerCorpus: Seq[(String, String)] = Seq(
    "js_high_water" -> highWaterSource,
    "js_string_accum" -> stringAccumSource,
    "js_branch_fold" -> branchFoldSource,
    "js_streams_matching" -> streamsMatchingSource,
    "js_first_event" -> firstEventSource,
    "js_nested_state" -> nestedStateSource,
    "js_early_return" -> earlyReturnSource,
    "js_array_collect" -> arrayCollectSource,
    "js_minmax" -> minmaxSource,
    "js_last_value" -> lastValueSource,
    "js_date_bucket" -> dateSource,
    "js_fold_count_sum" -> foldSource,
    "js_try_switch" -> trySwitchSource,
    "js_regex_extract" -> regexSource,
    "js_string_ops" -> stringOpsSource,
    "js_partition_by" -> partitionSource,
    "js_count_by_type" -> countByTypeSource,
    "js_last_by_type" -> lastByTypeSource,
    "js_map_guard" -> mapGuardSource,
    "js_map_last_guard" -> mapLastGuardSource,
    "js_array_guard" -> arrayGuardSource,
    "js_emit" -> emitSource,
    "js_emit_stateful" -> emitStatefulSource,
    "js_linkto" -> linkSource,
    "js_transform_filter" -> transformSource,
    "js_output_state" -> outputSource)

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "js_minmax" -> (jsMinMax _),
    "js_last_value" -> (jsLastValue _),
    "js_date_bucket" -> (jsDateBucket _),
    "js_fold_count_sum" -> (jsFold _),
    "js_try_switch" -> (jsTrySwitch _),
    "js_regex_extract" -> (jsRegexExtract _),
    "js_string_ops" -> (jsStringOps _),
    "js_partition_by" -> (jsPartitionBy _),
    "js_count_by_type" -> (jsCountByType _),
    "js_last_by_type" -> (jsLastByType _),
    "js_map_guard" -> (jsMapGuard _),
    "js_array_guard" -> (jsArrayGuard _),
    "js_emit" -> (jsEmit _),
    "js_emit_stateful" -> (jsEmitStateful _),
    "js_linkto" -> (jsLinkTo _),
    "js_transform_filter" -> (jsTransformFilter _),
    "js_output_state" -> (jsOutputState _),
    "js_array_collect" -> (jsArrayCollect _),
    "js_early_return" -> (jsEarlyReturn _),
    "js_nested_state" -> (jsNestedState _),
    "js_string_accum" -> (jsStringAccum _),
    "js_branch_fold" -> (jsBranchFold _),
    "js_streams_matching" -> (jsStreamsMatching _),
    "js_first_event" -> (jsFirstEvent _),
    "js_high_water" -> (jsHighWater _)
  )

  private val L = Tables.eventLogSql

  def oracles: Seq[(String, String)] = Seq(
    "js_string_accum" -> s"""$L
      |SELECT stream_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       coalesce(string_agg(event_type || ';', '' ORDER BY log_position),
      |                '') AS trail
      |FROM log WHERE event_type = 'purchase'
      |  AND split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // hi folds Math.max from init 0; trail PREPENDS — latest event first
    // (ORDER BY log_position DESC), init '' as the suffix
    "js_branch_fold" -> s"""$L
      |SELECT stream_id AS partition,
      |       CAST(coalesce(max(CAST(round(value * 100) AS BIGINT))
      |         FILTER (WHERE value >= 50), 0) AS BIGINT) AS hi_cents,
      |       CAST(count(*) FILTER (WHERE value < 50) AS BIGINT) AS small,
      |       coalesce(string_agg(event_type || '|', '' ORDER BY log_position DESC)
      |         FILTER (WHERE value < 50), '') AS trail
      |FROM log WHERE event_type = 'purchase'
      |  AND split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "js_streams_matching" -> s"""$L
      |SELECT stream_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM log WHERE regexp_matches(stream_id, '^purchase-1[0-9]$$')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // peak = running max seeded 0; rises counts strict prefix-max breaks
    // (first event vs the 0 seed); repeats counts consecutive same-type
    // pairs (lag default '' = the $init last); low = min over all cents
    // (the Infinity seed always loses on a non-empty stream)
    "js_high_water" -> s"""$L,
      |w AS (
      |  SELECT stream_id, event_type, log_position,
      |         CAST(round(value * 100) AS BIGINT) AS cents,
      |         greatest(CAST(0 AS BIGINT),
      |           coalesce(max(CAST(round(value * 100) AS BIGINT)) OVER (
      |             PARTITION BY stream_id ORDER BY log_position
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS prepeak,
      |         coalesce(lag(event_type) OVER (
      |           PARTITION BY stream_id ORDER BY log_position), '') AS prev_type
      |  FROM log WHERE split_part(stream_id, '-', 1) = 'purchase')
      |SELECT stream_id AS partition,
      |       CAST(greatest(0, max(cents)) AS BIGINT) AS peak_cents,
      |       CAST(count(*) FILTER (WHERE cents > prepeak) AS BIGINT) AS rises,
      |       CAST(count(*) FILTER (WHERE event_type = prev_type) AS BIGINT) AS repeats,
      |       CAST(min(cents) AS BIGINT) AS low_cents
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // first purchase (by log position) lands in first_cents, the rest in
    // later_cents; category streams with zero purchase-typed events keep
    // $init (0/0/0) — the fold runs no handler but the key still folds
    "js_first_event" -> s"""$L
      |SELECT stream_id AS partition,
      |       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n,
      |       CAST(coalesce(CAST(round(arg_min(value, log_position)
      |         FILTER (WHERE event_type = 'purchase') * 100) AS BIGINT), 0)
      |         AS BIGINT) AS first_cents,
      |       CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
      |           FILTER (WHERE event_type = 'purchase'), 0)
      |         - coalesce(CAST(round(arg_min(value, log_position)
      |           FILTER (WHERE event_type = 'purchase') * 100) AS BIGINT), 0)
      |         AS BIGINT) AS later_cents
      |FROM log WHERE split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "js_nested_state" -> s"""$L
      |SELECT stream_id AS partition, 'agg' AS kind,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
      |       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS hi
      |FROM log WHERE event_type = 'purchase'
      |  AND split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "js_early_return" -> s"""$L
      |SELECT stream_id AS partition,
      |       CAST(count(*) FILTER (WHERE value < 50) AS BIGINT) AS small,
      |       CAST(count(*) FILTER (WHERE value >= 50) AS BIGINT) AS n,
      |       CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
      |         FILTER (WHERE value >= 50), 0) AS BIGINT) AS cents
      |FROM log WHERE event_type = 'purchase'
      |  AND split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // push order == log order within the stream; string_agg ORDER BY
    // log_position mirrors the compiled fold's array_sort finalizer
    "js_array_collect" -> s"""$L
      |SELECT stream_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       '[' || coalesce(string_agg(
      |         CASE WHEN value > 150.0
      |              THEN CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) END,
      |         ',' ORDER BY log_position), '') || ']' AS big
      |FROM log WHERE event_type = 'purchase' AND split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "js_minmax" -> s"""$L
      |SELECT stream_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS hi_cents,
      |       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS lo_cents
      |FROM log WHERE event_type = 'purchase' AND split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the last purchase per stream: arg_max mirrors max-by-log-position;
    // streams of the category with zero purchase-typed events keep their
    // $init state (status "new", lastCents null, lastAt key absent →
    // get_json_object NULL on the Spark side, SQL NULL here)
    "js_last_value" -> s"""$L
      |SELECT stream_id AS partition,
      |       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n,
      |       CASE WHEN count(*) FILTER (WHERE event_type = 'purchase') = 0 THEN 'new'
      |            WHEN arg_max(value, log_position)
      |                   FILTER (WHERE event_type = 'purchase') > 150.0 THEN 'big'
      |            ELSE 'small' END AS status,
      |       CAST(round(arg_max(value, log_position)
      |                    FILTER (WHERE event_type = 'purchase') * 100)
      |            AS BIGINT) AS last_cents,
      |       strftime(arg_max(timestamp, log_position)
      |                  FILTER (WHERE event_type = 'purchase'),
      |                '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS last_at
      |FROM log WHERE split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB reads the parquet TIMESTAMP(NANOS) as TIMESTAMP (µs), so the
    // CTE's `timestamp` is a timestamp value; epoch_us//1000 = the same
    // ms truncation JS getTime() sees. DuckDB dow is Sunday=0 like ES.
    "js_date_bucket" -> s"""$L
      |SELECT strftime(timestamp, '%Y-%m-%dT%H') AS partition,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(date_part('dow', timestamp) AS BIGINT))
      |            AS BIGINT) AS dow_sum,
      |       CAST(sum(CAST(floor((epoch_us(timestamp) // 1000 - 1577836800000)
      |                           / 86400000.0) AS BIGINT)) AS BIGINT) AS day_sum
      |FROM log GROUP BY 1 ORDER BY 1""".stripMargin,
    "js_fold_count_sum" -> s"""$L
      |SELECT stream_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM log WHERE event_type = 'purchase' AND split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "js_try_switch" -> s"""$L
      |SELECT stream_id AS partition,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
      |       CAST(sum(CASE WHEN value > 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS big,
      |       CAST(sum(CASE WHEN correlation_id IS NOT NULL
      |                     THEN length(correlation_id) ELSE 0 END) AS BIGINT) AS k_len,
      |       CAST(sum(CASE WHEN correlation_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS no_k
      |FROM log WHERE event_type = 'purchase' AND split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "js_regex_extract" -> s"""$L
      |SELECT stream_id AS partition,
      |       CAST(count(*) * (length(stream_id) - length(replace(stream_id, '-', '')) + 1)
      |            AS BIGINT) AS parts,
      |       CAST(count(*) * (CASE WHEN regexp_extract(stream_id, '\\d+') <> ''
      |                             THEN CAST(regexp_extract(stream_id, '\\d+') AS BIGINT)
      |                             ELSE 0 END) AS BIGINT) AS id_sum,
      |       CAST(sum(CASE WHEN regexp_matches(stream_id, '\\d\\d') THEN 1 ELSE 0 END)
      |            AS BIGINT) AS two_digit,
      |       regexp_replace(stream_id, '\\d', '#', 'g') AS masked
      |FROM log WHERE event_type = 'purchase' AND split_part(stream_id, '-', 1) = 'purchase'
      |GROUP BY stream_id ORDER BY 1""".stripMargin,
    "js_string_ops" -> s"""$L
      |SELECT stream_id AS partition,
      |       CAST(count(*) AS BIGINT) AS users,
      |       CAST(sum(CAST(split_part(stream_id, '-', 2) AS BIGINT)) AS BIGINT) AS kid,
      |       arg_max(lower(data), log_position) AS clean,
      |       CAST(sum(CASE WHEN data LIKE '%"k"%' THEN 1 ELSE 0 END) AS BIGINT) AS flag,
      |       '"signup"' AS j
      |FROM log WHERE event_type = 'signup' AND split_part(stream_id, '-', 1) = 'signup'
      |GROUP BY stream_id ORDER BY 1""".stripMargin,
    "js_partition_by" -> s"""$L
      |SELECT correlation_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM log WHERE correlation_id IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "js_count_by_type" -> s"""$L
      |SELECT l.correlation_id AS partition, t.n, l.event_type AS etype,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM log l
      |JOIN (SELECT correlation_id, CAST(count(*) AS BIGINT) AS n FROM log
      |      WHERE correlation_id IS NOT NULL GROUP BY 1) t
      |  ON t.correlation_id = l.correlation_id
      |GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,
    "js_last_by_type" -> s"""$L
      |SELECT correlation_id AS partition, event_type AS etype,
      |       arg_max(CAST(round(value * 100) AS BIGINT), log_position) AS last_cents
      |FROM log WHERE correlation_id IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // prev_n = writes to this (partition, type) key BEFORE this event —
    // exactly the pre-state window the compiled read reconstructs:
    // membership guard counts cents where prev_n >= 1, the threshold
    // guard fires from the third occurrence (prev count >= 2)
    "js_map_guard" -> s"""$L,
      |w AS (
      |  SELECT correlation_id, event_type, log_position,
      |         CAST(round(value * 100) AS BIGINT) AS cents,
      |         count(*) OVER (PARTITION BY correlation_id, event_type
      |           ORDER BY log_position
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_n
      |  FROM log WHERE correlation_id IS NOT NULL),
      |t AS (
      |  SELECT correlation_id,
      |         CAST(coalesce(sum(cents) FILTER (WHERE prev_n >= 1), 0) AS BIGINT)
      |           AS repeat_cents,
      |         CAST(count(*) FILTER (WHERE prev_n >= 2) AS BIGINT) AS bursts
      |  FROM w GROUP BY 1)
      |SELECT w.correlation_id AS partition, t.repeat_cents, t.bursts,
      |       w.event_type AS etype, CAST(count(*) AS BIGINT) AS cnt
      |FROM w JOIN t ON t.correlation_id = w.correlation_id
      |GROUP BY 1, 2, 3, 4 ORDER BY 1, 4""".stripMargin,
    // prev_same = prior events of this (partition, type) — the membership
    // window (every row offers its type under the self-dedup idiom);
    // types_before = DISTINCT types among strictly-preceding rows via the
    // first-occurrence flag (prev_same = 0) running-summed — the length
    // window; types = first-seen-ordered distinct list, the push fold
    "js_array_guard" -> s"""$L,
      |w AS (
      |  SELECT correlation_id, event_type, log_position,
      |         CAST(round(value * 100) AS BIGINT) AS cents,
      |         count(*) OVER (PARTITION BY correlation_id, event_type
      |           ORDER BY log_position
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_same
      |  FROM log WHERE correlation_id IS NOT NULL),
      |w2 AS (
      |  SELECT w.*,
      |         coalesce(sum(CASE WHEN prev_same = 0 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY correlation_id ORDER BY log_position
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS types_before
      |  FROM w),
      |t AS (
      |  SELECT correlation_id,
      |         CAST(coalesce(sum(cents) FILTER (WHERE prev_same >= 1), 0)
      |           AS BIGINT) AS repeat_cents,
      |         CAST(count(*) FILTER (WHERE types_before >= 2) AS BIGINT)
      |           AS breadth2
      |  FROM w2 GROUP BY 1),
      |ty AS (
      |  SELECT correlation_id,
      |         '[' || string_agg('"' || event_type || '"', ',' ORDER BY first_lp)
      |           || ']' AS types
      |  FROM (SELECT correlation_id, event_type, min(log_position) AS first_lp
      |        FROM w GROUP BY 1, 2) GROUP BY 1)
      |SELECT t.correlation_id AS partition, t.repeat_cents, t.breadth2, ty.types
      |FROM t JOIN ty ON ty.correlation_id = t.correlation_id
      |ORDER BY 1""".stripMargin,
    "js_emit" -> s"""$L
      |SELECT 'receipt-' || split_part(log.stream_id, '-', 2) AS stream_id,
      |       'ReceiptIssued' AS event_type,
      |       '{"cents":' || CAST(round(log.value * 100) AS BIGINT) || '}' AS data,
      |       log.stream_id AS partition,
      |       log.log_position AS caused_by_position
      |FROM log WHERE log.event_type = 'purchase' AND log.value > 150.0
      |ORDER BY caused_by_position""".stripMargin,
    // running count/sum per stream in log order; a milestone row fires
    // on every 5th purchase with the running totals AT that event —
    // exactly the post-state the handler reads after its two updates
    "js_emit_stateful" -> s"""$L
      |, w AS (
      |  SELECT stream_id, log_position,
      |         CAST(count(*) OVER (PARTITION BY stream_id ORDER BY log_position) AS BIGINT) AS rn,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT))
      |              OVER (PARTITION BY stream_id ORDER BY log_position) AS BIGINT) AS cents
      |  FROM log
      |  WHERE event_type = 'purchase' AND split_part(stream_id, '-', 1) = 'purchase')
      |SELECT 'milestone-' || stream_id AS stream_id,
      |       'Milestone' AS event_type,
      |       '{"n":' || CAST(rn AS VARCHAR) || ',"total":' || CAST(cents AS VARCHAR) || '}' AS data,
      |       stream_id AS partition,
      |       log_position AS caused_by_position
      |FROM w WHERE rn % 5 = 0
      |ORDER BY caused_by_position""".stripMargin,
    "js_linkto" -> s"""$L
      |SELECT 'corr-' || correlation_id AS stream_id,
      |       '$$>' AS event_type,
      |       CAST(event_number AS VARCHAR) || '@' || log.stream_id AS data,
      |       log.log_position AS caused_by_position
      |FROM log WHERE correlation_id IS NOT NULL
      |ORDER BY caused_by_position""".stripMargin,
    "js_transform_filter" -> s"""$L
      |SELECT stream_id AS partition, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
      |         / count(*) AS avg_value
      |FROM log WHERE split_part(stream_id, '-', 1) = 'error'
      |GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1""".stripMargin,
    "js_output_state" -> s"""$L
      |SELECT '$$projections-jsclicks-' || stream_id || '-result' AS stream_id,
      |       'Result' AS event_type,
      |       '{"n":' || CAST(count(*) AS VARCHAR) || ',"cents":' ||
      |         CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS VARCHAR) || '}' AS data,
      |       stream_id AS partition
      |FROM log WHERE event_type = 'click' AND split_part(stream_id, '-', 1) = 'click'
      |GROUP BY stream_id ORDER BY partition""".stripMargin
  )
}
