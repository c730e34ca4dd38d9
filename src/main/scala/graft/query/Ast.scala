package graft.query

/** InfluxQL AST — only the surface the reference consumes (SURVEY §3.2/§3.3:
  * cflux.js:691-743 for SELECT; cflux.js:395-852 for the dispatch table). */
object Ast {

  sealed trait Statement

  /** One projected metric: `func("name") [AS alias]` or bare `"name"`.
    * The reference reads returnColumns[].sourceColumns[].value
    * (cflux.js:734,745-748) and ignores the function (always avg); we honor
    * the function (SURVEY §2.4 build note). */
  /** @param arg numeric second function argument, e.g.
    *             `percentile("value", 95)` — InfluxQL surface the
    *             reference drops entirely (avg hardwired, cflux.js:749) */
  /** Window transform wrapping an aggregate, InfluxQL function-of-function
    * surface (extension): `derivative(mean("v"), 1s)`,
    * `moving_average(mean("v"), 3)`, `difference(...)`,
    * `non_negative_derivative(...)`, `cumulative_sum(...)`. */
  final case class Transform(fn: String, durMs: Option[Long] = None, n: Option[Int] = None)

  /** @param argDur duration second argument (`elapsed("v", 1s)`), ms
    * @param expr   when set, the projection is an ARITHMETIC EXPRESSION
    *               over field/aggregate leaves (`mean("a") * 2 + 1`,
    *               `"a" + "b"`, `sqrt(mean("v"))`) — InfluxQL operator
    *               surface (extension; the reference drops everything but
    *               a bare name, cflux.js:734). func/name then only carry
    *               the derived output name. */
  final case class Field(func: Option[String], name: String, alias: Option[String],
                         arg: Option[Double] = None,
                         transform: Option[Transform] = None,
                         argDur: Option[Long] = None,
                         expr: Option[FExpr] = None,
                         /** 3-arg top/bottom("field", "tag", N): the tag
                           * key whose values compete (InfluxDB's
                           * per-tag-value extremes form). */
                         selTag: Option[String] = None,
                         /** Regex field projection `SELECT /re/` — expands
                           * to the matching field keys at plan time. */
                         nameRegex: Option[String] = None)

  /** Arithmetic expression tree over projection leaves (extension).
    * Leaves are ordinary [[Field]]s (bare field or aggregate call);
    * binary ops pair points of the SAME timestamp and series, InfluxDB
    * semantics (unpaired points drop out). */
  sealed trait FExpr
  final case class FLeaf(field: Field) extends FExpr
  final case class FNum(v: Double) extends FExpr
  final case class FBin(op: String, l: FExpr, r: FExpr) extends FExpr
  /** Unary math call: abs/ceil/floor/round/sqrt/exp/ln/log2/log10 and
    * trig, plus the binary forms pow(x, n), atan2(x, d), log(x, b) —
    * `arg` carries the second operand. round is half-up (floor(x+0.5);
    * InfluxDB rounds half away from zero — documented divergence at
    * negative .5 boundaries). */
  final case class FMath(fn: String, x: FExpr, arg: Option[Double] = None) extends FExpr

  object FExpr {
    /** Leaf fields of `e`, left-to-right, duplicates removed. */
    def leaves(e: FExpr): Seq[Field] = {
      val out = scala.collection.mutable.LinkedHashSet.empty[Field]
      def go(x: FExpr): Unit = x match {
        case FLeaf(f)       => out += f
        case FNum(_)        =>
        case FBin(_, l, r)  => go(l); go(r)
        case FMath(_, x, _) => go(x)
      }
      go(e)
      out.toSeq
    }
  }

  /** A time bound from the WHERE clause — the four shapes of
    * cflux.js:702-727. Resolved to epoch ms at plan time. */
  sealed trait TimeExpr
  final case class NowMinus(durMs: Long) extends TimeExpr // time > now() - 1h
  final case class AbsoluteNs(ns: Long) extends TimeExpr // time > 1545424651000000000
  final case class DateString(s: String) extends TimeExpr // time > '2018-12-21 00:00:00'
  case object Now extends TimeExpr // time < now()

  /** Strict flags preserve `>`/`<` vs `>=`/`<=` (the reference conflates
    * them into BETWEEN, cflux.js:765 — a pagination-duplicating bug we fix;
    * semantics are applied at ms resolution, the storage precision). */
  final case class TimeBounds(lower: Option[TimeExpr], upper: Option[TimeExpr],
                              lowerStrict: Boolean = false, upperStrict: Boolean = false)

  /** One WHERE tag conjunct. `op` ∈ =, !=, =~, !~ (the reference extracts
    * only equality, cflux.js:737-743; the rest is the InfluxQL surface an
    * InfluxDB client expects). For =~/!~ `value` is the regex source. */
  final case class TagFilter(key: String, op: String, value: String)

  /** One WHERE field-value conjunct (`"value" > 50` — numeric RHS means a
    * FIELD comparison in InfluxQL; tag values are always strings).
    * `op` ∈ > >= < <= = !=. Applied to raw points BEFORE aggregation
    * (InfluxDB semantics). Extension: the reference drops everything but
    * time/tag equality. */
  final case class FieldFilter(name: String, op: String, v: Double)

  /** @param regex InfluxQL regex measurement ref (FROM /cpu../) — resolved
    *               at plan time to every matching measurement (extension;
    *               the reference's regex dispatch never matches one). */
  final case class TableRef(db: Option[String], rp: Option[String], measurement: String,
                            regex: Option[String] = None)

  final case class Select(
      fields: Seq[Field],
      from: TableRef,
      time: TimeBounds,
      tagFilters: Seq[TagFilter], // "tag" =/!=/=~/!~ conjuncts
      groupByTimeMs: Option[Long], // honored (divergence: reference strips it, cflux.js:378)
      groupByTags: Seq[String],
      fill: Option[String],
      limit: Option[Int], // honored (divergence: reference strips it, cflux.js:689)
      orderDesc: Boolean = false, // ORDER BY time DESC (reference ignores)
      offset: Option[Int] = None, // point pagination (extension)
      slimit: Option[Int] = None, // series limit (extension)
      soffset: Option[Int] = None, // series pagination (extension)
      /** FROM (SELECT …) subquery (extension): the outer query runs over
        * the inner result's per-(label pair) series, with the inner's
        * output field names as the outer's field keys. `from` mirrors the
        * innermost table ref for response naming. */
      fromSub: Option[Select] = None,
      /** GROUP BY time(x, offset) bucket shift, ms (extension). */
      groupByTimeOffsetMs: Long = 0L,
      /** SELECT … INTO "target": write the result back as a measurement
        * (extension; InfluxQL's downsampling/copy primitive, also the body
        * of a continuous query). */
      into: Option[TableRef] = None,
      /** WHERE field-value conjuncts (extension). */
      fieldFilters: Seq[FieldFilter] = Nil,
      /** Parenthesized OR-groups of tag predicates (extension):
        * `("host" = 'a' OR "host" = 'b')` — AND across groups, OR within
        * a group. */
      tagOrGroups: Seq[Seq[TagFilter]] = Nil,
      /** tz('Zone/Name') trailing clause: GROUP BY time buckets align to
        * local wall-clock boundaries in the zone (InfluxQL surface). */
      tz: Option[String] = None,
      /** Additional comma-separated FROM refs (`FROM "cpu", "mem"`):
        * the statement runs over every listed measurement, one result
        * series set per measurement (InfluxQL multi-measurement FROM). */
      fromMulti: Seq[TableRef] = Nil
  ) extends Statement

  /** CREATE DATABASE "db" [WITH [DURATION d] [REPLICATION n]
    * [SHARD DURATION d] [NAME "rp"]] — the WITH clause registers the
    * initial retention policy (REPLICATION and SHARD DURATION are
    * accepted and ignored: single store, hour partitions). */
  final case class CreateDatabase(db: String,
                                  rpDurationMs: Option[Long] = None,
                                  rpName: Option[String] = None) extends Statement

  /** CREATE CONTINUOUS QUERY "name" ON "db" [RESAMPLE [EVERY d] [FOR d]]
    * BEGIN select-into END (extension; InfluxDB's standing downsampling
    * queries). EVERY throttles the scheduler tick; FOR widens each run's
    * recomputed window to absorb late data (the engine deletes + rewrites
    * the covered target range — InfluxDB's point-upsert analogue). */
  final case class CreateContinuousQuery(name: String, db: String, select: Select,
                                         raw: String = "",
                                         everyMs: Option[Long] = None,
                                         forMs: Option[Long] = None) extends Statement
  final case class DropContinuousQuery(name: String, db: String) extends Statement
  case object ShowContinuousQueries extends Statement
  case object ShowDatabases extends Statement
  /** @param regex WITH MEASUREMENT =~ /re/ filter (InfluxDB surface). */
  final case class ShowMeasurements(db: Option[String],
                                    regex: Option[String] = None) extends Statement
  final case class ShowRetentionPolicies(db: Option[String]) extends Statement
  final case class ShowFieldKeys(from: Option[TableRef]) extends Statement
  /** @param tagFilters WHERE "tag" = 'v' conjuncts scoping the
    *                    contributing series (InfluxDB surface). */
  final case class ShowTagKeys(from: Option[TableRef],
                               tagFilters: Seq[TagFilter] = Nil) extends Statement
  /** @param keyRegex `WITH KEY =~ /re/` matcher (extension)
    * @param tagFilters trailing WHERE "tag" = 'v' conjuncts: only series
    *                   matching them contribute pairs (InfluxDB's scoped
    *                   tag-values listing) */
  final case class ShowTagValues(from: Option[TableRef], keys: Seq[String],
                                 keyRegex: Option[String] = None,
                                 tagFilters: Seq[TagFilter] = Nil) extends Statement
  /** SHOW SERIES [FROM m] — series keys `measurement,k1=v1,k2=v2`
    * (extension: InfluxDB metadata surface the reference lacks). */
  /** @param tagFilters WHERE "tag" = 'v' [AND …] conjuncts (InfluxDB's
    *                    SHOW SERIES filter; = / != like DROP SERIES). */
  final case class ShowSeries(from: Option[TableRef],
                              tagFilters: Seq[TagFilter] = Nil) extends Statement
  /** SHOW SERIES [EXACT] CARDINALITY [FROM m] (extension). */
  final case class ShowSeriesCardinality(from: Option[TableRef]) extends Statement
  /** SHOW <listing> LIMIT n [OFFSET m] — InfluxDB paginates its metadata
    * listings; the engine slices the planned DataFrame (limit/offset are
    * plan nodes, so the slice rides the same Catalyst plan). */
  final case class ShowLimited(inner: Statement, limit: Option[Int],
                               offset: Option[Int]) extends Statement
  /** SHOW MEASUREMENT / FIELD KEY / TAG KEY [EXACT] CARDINALITY
    * (extension); kind ∈ measurement | field_key | tag_key. */
  final case class ShowCardinality(kind: String, from: Option[TableRef]) extends Statement
  /** SHOW TAG VALUES [EXACT] CARDINALITY [FROM m] [WITH KEY …]: distinct
    * value count PER tag key (InfluxDB reports one total; per-key is the
    * more informative superset — documented divergence). */
  final case class ShowTagValuesCardinality(from: Option[TableRef],
                                            keys: Seq[String]) extends Statement
  final case class CreateSubscription(id: String, db: String, rp: String, dest: String) extends Statement
  /** CREATE RETENTION POLICY "n" ON "db" DURATION d REPLICATION r
    * [DEFAULT] — honest retention (extension: the reference only
    * fabricates a static SHOW response, cflux.js:419-448). Enforcement =
    * `GraftEngine.enforceRetention` dropping expired hour partitions. */
  final case class CreateRetentionPolicy(name: String, db: String,
                                         durationMs: Long,
                                         default: Boolean) extends Statement
  /** DROP MEASUREMENT "m" — removes the measurement's data + series
    * metadata (extension: storage lifecycle the reference lacks). */
  final case class DropMeasurement(measurement: String) extends Statement
  /** DELETE FROM "m" [WHERE time …] — point deletion by time range; no
    * WHERE deletes every point but keeps series metadata (extension). */
  final case class DeleteFrom(from: TableRef, time: TimeBounds) extends Statement
  /** DROP SERIES [FROM "m"] [WHERE "tag" = 'v' …] — removes matching
    * series' data AND index entries (InfluxDB DROP SERIES; extension).
    * Tag conjuncts are = / != equality only, like InfluxDB's. */
  final case class DropSeries(from: Option[TableRef],
                              tagFilters: Seq[TagFilter]) extends Statement
  /** DROP DATABASE "db" — removes the database's entire storage tree,
    * caches, and registered policies/CQs (extension: storage lifecycle
    * the reference lacks). */
  final case class DropDatabase(db: String) extends Statement
  /** DROP RETENTION POLICY "name" ON "db" — unregisters the policy. */
  final case class DropRetentionPolicy(name: String, db: String) extends Statement
  /** ALTER RETENTION POLICY — re-registers with the new duration. */
  final case class AlterRetentionPolicy(name: String, db: String,
                                        durationMs: Long,
                                        default: Boolean) extends Statement
  case object ShowSubscriptions extends Statement
  /** SHOW QUERIES / KILL QUERY n — statement-compat mocks: execution is
    * synchronous in this engine, so the running-query registry is always
    * empty (same spirit as the reference's static SHOW SUBSCRIPTIONS
    * mock, cflux.js:835-844). */
  case object ShowQueries extends Statement
  final case class KillQuery(qid: Long) extends Statement
  /** SHOW SHARDS — honest implementation over the engine's storage: one
    * row per stored (measurement, hour) partition directory; the hour
    * partition IS the shard (the reference's toRelativeHourNum partition,
    * cflux.js:152). InfluxDB's shard_group is a numeric id; ours carries
    * the measurement name (per-measurement tables — documented
    * divergence). */
  case object ShowShards extends Statement
  /** SHOW USERS — lists the registered user registry (empty until
    * CREATE USER runs; the reference has no auth subsystem at all). */
  case object ShowUsers extends Statement
  /** DROP SHARD <id> — honest: the id SHOW SHARDS reports IS the hour
    * number (the hour partition is the shard, cflux.js:152), and like an
    * InfluxDB shard group spans every measurement — dropping deletes
    * that hour's partition dir in each (metadata-cost, no data read). */
  final case class DropShard(id: Long) extends Statement
  /** CREATE USER "n" WITH PASSWORD 'p' [WITH ALL PRIVILEGES] — registry
    * entry only: the engine performs no authentication (documented;
    * the HTTP front accepts-and-ignores credentials like the v2 token),
    * but the admin DDL round-trips so SHOW USERS / SHOW GRANTS are
    * honest. The password is ignored, never stored. */
  final case class CreateUser(name: String, admin: Boolean) extends Statement
  /** DROP USER "n" — removes the registry entry and its grants. */
  final case class DropUser(name: String) extends Statement
  /** GRANT READ|WRITE|ALL [PRIVILEGES] ON "db" TO "u" (ALL may omit ON —
    * cluster-wide admin). */
  final case class Grant(privilege: String, db: Option[String], user: String) extends Statement
  /** REVOKE — removes the matching grant (ALL without ON clears admin). */
  final case class Revoke(privilege: String, db: Option[String], user: String) extends Statement
  /** SHOW GRANTS FOR "u" — the user's per-db privileges. */
  final case class ShowGrants(user: String) extends Statement
  /** SHOW STATS — honest per-db storage statistics (measurements, series,
    * hour partitions, parquet files) from a metadata-cost directory walk
    * plus the schema-sized series index; InfluxDB reports runtime
    * counters, we report the storage truths the engine actually has. */
  case object ShowStats extends Statement
  /** SHOW DIAGNOSTICS — honest build/runtime facts (Spark version, Scala
    * version, available processors). */
  case object ShowDiagnostics extends Statement
  /** EXPLAIN SELECT … — returns the engine's ACTUAL physical plan (the
    * Spark formatted explain) as a one-column series; the Spark-native
    * answer to InfluxDB's EXPLAIN. */
  final case class Explain(select: Select) extends Statement
  /** Anything else → reference logs UNSUPPORTED and returns an empty result
    * (cflux.js:846-852). */
  final case class Unsupported(raw: String) extends Statement
}
