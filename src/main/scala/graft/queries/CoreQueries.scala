package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Relational
import QueryDSL._

/** SURVEY §2 operator inventory, part 1: scans (S4–S6), projections/filters
  * (P1–P8), joins (J1–J5), core aggregates/sets/sorts (A4, A6, U1, U3, U4,
  * W1) plus the flagship pricing-summary aggregate. Each entry pairs the
  * Spark pipeline with its DuckDB oracle; every query ends in an aggregate
  * and/or a total-order sort for deterministic hashing.
  */
object CoreQueries {

  /** One-shot SCD2 build over all user_id < 40 events — j8's oracle, and
    * st15's verbatim: both the batch fold-in and the streaming per-batch
    * fold-in must reproduce the one-shot window build exactly. */
  private[queries] val sqlScdOneShot: String =
    """WITH e AS (SELECT user_id, value AS attr, epoch_ns(ts) AS ts,
            event_id
          FROM events WHERE user_id < 40),
        ch AS (SELECT user_id, attr, ts, event_id FROM (
            SELECT user_id, attr, ts, event_id, lag(attr) OVER w AS prev
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          WHERE prev IS NULL OR attr <> prev),
        scd AS (SELECT user_id, attr, ts AS valid_from,
            lead(ts) OVER w2 AS valid_to
          FROM ch
          WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, attr, valid_from, valid_to,
          valid_to IS NULL AS is_current
        FROM scd ORDER BY user_id, valid_from"""

  val defs: Map[String, Q] = Map(

    // Flagship: full-scan group aggregate (TPC-H Q1 shape). Decimal sums are
    // partition-order-independent; one shuffle on the 6-value group key with
    // map-side partial aggregation.
    "q1_agg" -> Q(
      (s, dir) => T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc,
        count(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // S4: projected scan — column pruning must reach the parquet reader
    // (ReadSchema carries only 3 of 11 columns; the filter is pushed down).
    "s4_pruned_scan" -> Q(
      (s, dir) => T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .filter(col("l_orderkey") < 100)
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""")),

    // S6: INSERT-OR-IGNORE upsert semantics — append then keyed dedup.
    // Reference `perustats/BCRP/cache.py:182-209`.
    "s6_upsert_ignore" -> Q(
      (s, dir) => {
        val n = T(s, dir, "nation")
        Relational.keepFirst(n.unionByName(n), Seq("n_nationkey"), Seq(col("n_name")))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey
        FROM (SELECT *, row_number() OVER (PARTITION BY n_nationkey ORDER BY n_name) rn
              FROM (SELECT * FROM nation UNION ALL SELECT * FROM nation))
        WHERE rn = 1 ORDER BY n_nationkey""".stripMargin)),

    // P1: select / rename projection.
    "p1_project_rename" -> Q(
      (s, dir) => T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name").as("name"),
          col("c_mktsegment").as("segment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name AS name, c_mktsegment AS segment
        FROM customer ORDER BY c_custkey""")),

    // P2: case-insensitive regex OR filter. Reference
    // `perustats/MEF/utils/tables.py:9-17`.
    "p2_regex_filter" -> Q(
      (s, dir) => T(s, dir, "part")
        .filter(lower(col("p_type")).rlike("economy|promo"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("p_brand")),
      Some("""SELECT p_brand, count(*) AS cnt FROM part
        WHERE regexp_matches(lower(p_type), 'economy|promo')
        GROUP BY p_brand ORDER BY p_brand""")),

    // P3: date-cutoff boolean flag. Reference `perustats/BCRP/utils.py:92-102`.
    "p3_date_cutoff" -> Q(
      (s, dir) => T(s, dir, "orders")
        .withColumn("active", col("o_orderdate") >= lit("1997-01-01").cast("date"))
        .groupBy(col("active")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("active")),
      Some("""SELECT o_orderdate >= DATE '1997-01-01' AS active, count(*) AS cnt
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // P4: null-drop on a key column before aggregation.
    "p4_nulldrop" -> Q(
      (s, dir) => events(s, dir)
        .na.drop(Seq("value"))
        .groupBy(col("event_type"))
        .agg(sum(dec(col("value"))).cast("double").as("sum_value"),
          count(lit(1)).as("cnt"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        count(*) AS cnt
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type ORDER BY event_type""")),

    // P5: IN-list filter. Reference `perustats/inei/fetcher.py:209-210`.
    "p5_inlist" -> Q(
      (s, dir) => T(s, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_7", "NATION_19"))
        .orderBy(col("n_nationkey")),
      Some("""SELECT * FROM nation
        WHERE n_name IN ('NATION_1','NATION_7','NATION_19')
        ORDER BY n_nationkey""")),

    // P6: NOT-IN filter. Reference `perustats/infogob/30_organizaciones_politicas.py:42-48`.
    "p6_notin" -> Q(
      (s, dir) => T(s, dir, "customer")
        .filter(!col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS cnt FROM customer
        WHERE c_mktsegment NOT IN ('BUILDING','AUTOMOBILE')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // P7: equality-mask lookup — first row (by key order) matching an
    // exact predicate. Reference `perustats/inei/organizer.py:254-262`.
    "p7_lookup" -> Q(
      (s, dir) => T(s, dir, "part")
        .filter(col("p_brand") === "Brand#12" && col("p_size") <= 20)
        .orderBy(col("p_partkey")).limit(1)
        .select(col("p_partkey"), col("p_name"), col("p_type")),
      Some("""SELECT p_partkey, p_name, p_type FROM part
        WHERE p_brand = 'Brand#12' AND p_size <= 20
        ORDER BY p_partkey LIMIT 1""")),

    // P7/P8: first-match row under a total order (deterministic top-1).
    "p8_first_match" -> Q(
      (s, dir) => T(s, dir, "orders")
        .filter(col("o_orderpriority").startsWith("1-"))
        .orderBy(col("o_orderkey")).limit(1)
        .select(col("o_orderkey"), col("o_orderpriority")),
      Some("""SELECT o_orderkey, o_orderpriority FROM orders
        WHERE o_orderpriority LIKE '1-%' ORDER BY o_orderkey LIMIT 1""")),

    // J1: wide-cache full-outer upsert (new value wins; schema evolves both
    // directions). Exercises graft.ops.Relational.upsertWide.
    "j1_fullouter_upsert" -> Q(
      (s, dir) => {
        val o = T(s, dir, "orders")
        val existing = o.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_totalprice").as("price"),
            col("o_orderdate").cast("date").as("odate"))
        val incoming = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), (col("o_totalprice") * 2).as("price"),
            col("o_orderstatus").as("status"))
        Relational.upsertWide(existing, incoming, "o_orderkey")
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, COALESCE(n.price, o.price) AS price,
          o.odate AS odate, n.status AS status
        FROM (SELECT o_orderkey, o_totalprice AS price,
                CAST(o_orderdate AS DATE) AS odate
              FROM orders WHERE o_orderkey % 3 = 0) o
        FULL OUTER JOIN
             (SELECT o_orderkey, o_totalprice * 2 AS price,
                o_orderstatus AS status
              FROM orders WHERE o_orderkey % 2 = 0) n
        USING (o_orderkey) ORDER BY o_orderkey""")),

    // J2: incremental-resume anti join (customers with no orders).
    "j2_anti_resume" -> Q(
      (s, dir) => Relational.pendingAntiJoin(
          T(s, dir, "customer"),
          T(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey""")),

    // J3: catalog-validation semi join.
    "j3_semi_validate" -> Q(
      (s, dir) => T(s, dir, "orders")
        .join(broadcast(T(s, dir, "customer")
            .filter(col("c_mktsegment") === "BUILDING")
            .select(col("c_custkey").as("o_custkey"))),
          Seq("o_custkey"), "left_semi")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, count(*) AS cnt FROM orders o
        WHERE EXISTS (SELECT 1 FROM customer c
          WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // J4: small-dim enrichment with explicit broadcast (no shuffle of the
    // fact side for the joins; single shuffle for the final group-by).
    "j4_broadcast_enrich" -> Q(
      (s, dir) => T(s, dir, "lineitem")
        .join(broadcast(T(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(T(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(*) AS cnt
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // J5/U3: delta vs. cached key set (EXCEPT).
    "j5_except_delta" -> Q(
      (s, dir) => T(s, dir, "lineitem")
        .select(col("l_partkey").as("k")).filter(col("k") < 500).distinct()
        .except(T(s, dir, "part").select(col("p_partkey").as("k")).filter(col("k") < 300))
        .orderBy(col("k")),
      Some("""SELECT * FROM (
          SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_partkey < 500
          EXCEPT
          SELECT p_partkey AS k FROM part WHERE p_partkey < 300)
        ORDER BY k""")),

    // J6: as-of join (latest prior purchase per click, per user) — the
    // time-series operator Spark lacks, composed as tagged-union + window
    // (ops.AsOfJoin); the oracle uses DuckDB's NATIVE ASOF JOIN, so the
    // composition is checked against an independent implementation.
    "j6_asof_join" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("purchase_value"))
        graft.ops.AsOfJoin
          .lastPrior(clicks, purchases, "user_id", "ts", "ts",
            Seq("purchase_value"))
          .select(col("event_id"), col("user_id"),
            round(col("purchase_value"), 4).as("purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH clicks AS (
            SELECT user_id, epoch_ns(ts) AS tns, event_id FROM events
            WHERE event_type = 'click'),
          purchases AS (
            SELECT user_id, epoch_ns(ts) AS tns, max(value) AS pv FROM events
            WHERE event_type = 'purchase' GROUP BY 1, 2)
          SELECT c.event_id, c.user_id, round(p.pv, 4) AS purchase_value
          FROM clicks c ASOF LEFT JOIN purchases p
            ON c.user_id = p.user_id AND c.tns >= p.tns
          ORDER BY c.event_id""")),

    // J7: interval (band) join — purchases within ±30 min of each click,
    // per user. Bucketed equi-join + refine (ops.AsOfJoin.intervalJoin);
    // the oracle is the naive inequality join, so the bucketing must find
    // exactly the same pairs.
    "j7_interval_join" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"),
            col("value").as("pvalue"))
        graft.ops.AsOfJoin.intervalJoin(clicks, purchases, "user_id",
            "ts", "pts", tolerance = 30L * 60 * 1000 * 1000 * 1000)
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(dec(col("pvalue"))).cast("double").as("sum_value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT c.event_id, count(*) AS n_purchases,
            CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          FROM (SELECT user_id, epoch_ns(ts) AS tns, event_id FROM events
                WHERE event_type = 'click') c
          JOIN (SELECT user_id, epoch_ns(ts) AS tns, value FROM events
                WHERE event_type = 'purchase') p
            ON c.user_id = p.user_id
            AND abs(c.tns - p.tns) <= 1800000000000
          GROUP BY c.event_id ORDER BY c.event_id""")),

    // J14: interval-OVERLAP join — the range join over two INTERVAL
    // sets with NO equi key, the shape j7's keyed band join can't
    // express (incident correlation: which user sessions were live
    // during a platform incident?). Sessions are st2's 30-min-gap
    // islands as [start, end] intervals (one shuffle on user);
    // incidents are ±5-min windows around a bounded set of error
    // events. The overlap is AsOfJoin.overlapJoin: both interval sets
    // explode into 1-hour buckets, candidates equi-join on the bucket
    // id, the exact overlap refines, and the canonical-bucket rule
    // (keep a pair only in its FIRST shared bucket) emits every true
    // pair exactly once with no distinct — a shuffle on the bucket id,
    // never an all-pairs comparison. The oracle is the naive
    // declarative overlap join, so a pair double-emitted by the
    // bucketing, or one lost at a bucket boundary, flips the hash.
    "j14_overlap_join" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val gapNs = 1800000000000L
        val ev = events(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val sess = ev
          .withColumn("__brk", when(lag(col("ts"), 1).over(w).isNull ||
            col("ts") - lag(col("ts"), 1).over(w) > gapNs, 1L)
            .otherwise(0L))
          .withColumn("sid", sum(col("__brk")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
        val inc = ev.filter(col("event_type") === "error" &&
            col("user_id") < 20)
          .select(col("event_id").as("incident_id"),
            (col("ts") - 300000000000L).as("i_start"),
            (col("ts") + 300000000000L).as("i_end"))
        val pairs = graft.ops.AsOfJoin.overlapJoin(sess, inc,
          "s_start", "s_end", "i_start", "i_end",
          bucketNs = 3600000000000L)
        pairs.agg(count(lit(1)).as("pairs"),
            countDistinct(col("user_id"), col("sid")).as("sessions_hit"),
            countDistinct(col("incident_id")).as("incidents_hit"))
          .crossJoin(sess.agg(count(lit(1)).as("sessions_total")))
          .crossJoin(inc.agg(count(lit(1)).as("incidents_total")))
      },
      Some("""WITH m AS (SELECT user_id, epoch_ns(ts) AS t, event_id,
              CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w
                  > 1800000000000 THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id
              ORDER BY epoch_ns(ts), event_id)),
          g AS (SELECT user_id, t, sum(brk) OVER
              (PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM m),
          sess AS (SELECT user_id, sid, min(t) AS s_start,
              max(t) AS s_end
            FROM g GROUP BY 1, 2),
          inc AS (SELECT event_id AS incident_id,
              epoch_ns(ts) - 300000000000 AS i_start,
              epoch_ns(ts) + 300000000000 AS i_end
            FROM events WHERE event_type = 'error' AND user_id < 20),
          pairs AS (SELECT s.user_id, s.sid, i.incident_id
            FROM sess s JOIN inc i
              ON s.s_start <= i.i_end AND i.i_start <= s.s_end)
          SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS pairs,
            (SELECT CAST(count(*) AS BIGINT) FROM
              (SELECT DISTINCT user_id, sid FROM pairs)) AS sessions_hit,
            (SELECT CAST(count(*) AS BIGINT) FROM
              (SELECT DISTINCT incident_id FROM pairs)) AS incidents_hit,
            (SELECT CAST(count(*) AS BIGINT) FROM sess)
              AS sessions_total,
            (SELECT CAST(count(*) AS BIGINT) FROM inc)
              AS incidents_total""")),

    // j11: NEAREST-in-time join — the attribution rule j6's
    // backward-only as-of misses (a purchase seconds AFTER the click
    // should win over one hours before): each click attaches the
    // purchase minimizing |gap| for its user, ties to the earlier
    // purchase. Two lastPrior window passes (prior + mirrored-axis next)
    // and a row-local pick — two key shuffles, no inequality join. The
    // oracle states the same semantics declaratively: argmin over the
    // per-user click × purchase pairs ordered by (gap, purchase ts).
    "j11_nearest_join" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts").as("pts"))
          .agg(max(col("value")).as("pvalue"))
        graft.ops.AsOfJoin
          .nearest(clicks, purchases, "user_id", "ts", "pts",
            Seq("pvalue"))
          .filter(col("matched_ts").isNotNull)
          .select(col("event_id"), col("user_id"),
            col("matched_ts").as("mts"), col("gap").as("gap_ns"),
            round(col("pvalue"), 4).as("pvalue"))
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (
            SELECT user_id, epoch_ns(ts) AS tns, event_id FROM events
            WHERE event_type = 'click'),
          p AS (
            SELECT user_id, epoch_ns(ts) AS pts, max(value) AS pv
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
          SELECT event_id, user_id, mts, gap_ns, pvalue FROM (
            SELECT c.event_id, c.user_id, p.pts AS mts,
              abs(c.tns - p.pts) AS gap_ns, round(p.pv, 4) AS pvalue,
              row_number() OVER (PARTITION BY c.event_id
                ORDER BY abs(c.tns - p.pts), p.pts) AS rn
            FROM c JOIN p USING (user_id))
          WHERE rn = 1 ORDER BY event_id""")),

    // j12: POINT-IN-TIME feature join — the feature-store computation
    // whose whole point is leakage-freedom (j6/j11 pick ONE matching
    // row; training features need an AGGREGATE over the strictly-prior
    // window): for every click, the count and value mass of the SAME
    // user's purchases in the trailing 24 h — never a future purchase.
    // The bucketed interval join (j7's equi-join + refine plan, no
    // inequality join) produces prior-window pairs; clicks with no
    // prior purchase keep zero features through the left join back.
    // DECIMAL sums keep the mass exact under any partitioning.
    "j12_pit_features" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"),
            col("value").as("pvalue"))
        val dayNs = 24L * 3600 * 1000 * 1000 * 1000
        val feat = graft.ops.AsOfJoin
          .intervalJoin(clicks, purchases, "user_id", "ts", "pts",
            tolerance = dayNs)
          .filter(col("pts") <= col("ts"))
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_24h"),
            sum(dec(col("pvalue"))).as("v_24h"))
        clicks.join(feat, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"),
            coalesce(col("n_24h"), lit(0L)).as("n_purch_24h"),
            coalesce(col("v_24h"), dec(lit(0))).cast("double")
              .as("sum_purch_24h"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT c.event_id, c.user_id,
            CAST(count(p.pts) AS BIGINT) AS n_purch_24h,
            CAST(coalesce(sum(CAST(p.value AS DECIMAL(18,2))),
              CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_purch_24h
          FROM (SELECT user_id, epoch_ns(ts) AS tns, event_id FROM events
                WHERE event_type = 'click') c
          LEFT JOIN (SELECT user_id, epoch_ns(ts) AS pts, value
                FROM events WHERE event_type = 'purchase') p
            ON c.user_id = p.user_id AND p.pts <= c.tns
               AND c.tns - p.pts <= 86400000000000
          GROUP BY 1, 2 ORDER BY 1""")),

    // j8: SCD2 dimension build + INCREMENTAL maintenance — the warehouse
    // twin of the round's index lifecycles: the per-user value history
    // builds as a type-2 dimension over the first ~70% of the event
    // range (percentile_disc threshold derived in-plan, 1-row broadcast
    // — no collect), then the remaining events fold in via applyChanges
    // (close open rows at the first new version, chain within the batch,
    // filter boundary no-ops). The oracle is the ONE-SHOT window build
    // over all events, so the fold-in identity applyChanges(build(e1),
    // e2) ≡ build(e1 ∪ e2) is itself what hash-matches. One shuffle per
    // stage (window by user) + key equi-joins; append-only contract
    // documented on the op.
    "j8_scd2" -> Q(
      (s, dir) => {
        import graft.ops.Scd
        val e = events(s, dir).filter(col("user_id") < 40)
          .select(col("user_id"), col("value"), col("ts"), col("event_id"))
        val thr = e.agg(
          expr("percentile_disc(0.7) WITHIN GROUP (ORDER BY ts)")
            .as("__thr"))
        val tagged = e.crossJoin(broadcast(thr))
        val dim = Scd.buildScd2(tagged.filter(col("ts") <= col("__thr")),
          "user_id", "value", "ts", "event_id")
        Scd.applyChanges(dim, tagged.filter(col("ts") > col("__thr")),
            "user_id", "value", "ts", "event_id")
          .orderBy(col("user_id"), col("valid_from"))
      },
      Some(sqlScdOneShot)),

    // j10: SCD2 POINT-IN-TIME lookup — the query j8's dimension exists
    // for: facts join the version in force AT THEIR OWN event time
    // (valid_from ≤ ts < valid_to), not the current one. The dimension
    // builds from the signup events; purchase/click facts look up the
    // signup value that governed them, with facts before a user's first
    // version surfacing as unmatched (the LEFT join every late-arriving-
    // dimension debate is about). Scale shape: the lookup is an EQUI-join
    // on the key with the validity range as residual predicates — fan-out
    // bounded by versions-per-key, one shuffle, no interval machinery
    // needed (j7's banded join is for predicates with no equi component).
    "j10_scd2_lookup" -> Q(
      (s, dir) => {
        import graft.ops.Scd
        val ev = events(s, dir).filter(col("user_id") < 40)
        val dim = Scd.buildScd2(
          ev.filter(col("event_type") === "signup")
            .select(col("user_id"), col("value"), col("ts"),
              col("event_id")),
          "user_id", "value", "ts", "event_id")
          .select(col("user_id").as("dim_user"), col("attr"),
            col("valid_from"), col("valid_to"))
        val facts = ev
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("user_id"), col("event_type"), col("ts"))
        facts.join(dim,
            col("user_id") === col("dim_user") &&
              col("valid_from") <= col("ts") &&
              (col("valid_to").isNull || col("ts") < col("valid_to")),
            "left")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("facts"),
            count(col("attr")).as("matched"),
            sum(dec(col("attr"))).cast("double").as("attr_mass"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT user_id, value AS attr, epoch_ns(ts) AS ts,
              event_id
            FROM events WHERE user_id < 40 AND event_type = 'signup'),
          ch AS (SELECT user_id, attr, ts, event_id FROM (
              SELECT user_id, attr, ts, event_id, lag(attr) OVER w AS prev
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            WHERE prev IS NULL OR attr <> prev),
          scd AS (SELECT user_id, attr, ts AS valid_from,
              lead(ts) OVER w2 AS valid_to
            FROM ch
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
          f AS (SELECT user_id, event_type, epoch_ns(ts) AS ts
            FROM events
            WHERE user_id < 40 AND event_type IN ('purchase', 'click')),
          j AS (SELECT f.event_type, s.attr
            FROM f LEFT JOIN scd s ON s.user_id = f.user_id
              AND s.valid_from <= f.ts
              AND (s.valid_to IS NULL OR f.ts < s.valid_to))
          SELECT event_type, count(*) AS facts,
            count(attr) AS matched,
            CAST(sum(CAST(attr AS DECIMAL(18,2))) AS DOUBLE) AS attr_mass
          FROM j GROUP BY event_type ORDER BY event_type""")),

    // j9: SALTED skew join — the join-level twin of a8's salted
    // aggregation: l_returnflag has 3 values, so a plain shuffle join
    // lands the whole fact table on 3 reducers; the salt spreads each
    // hot key over 16 (key, salt) sub-keys while the 3-row build side
    // replicates 16×. The shuffle_hash hint forces the shuffle-join
    // shape the pattern exists for (a broadcastable build side wouldn't
    // need salting). Exact per-flag stats (DECIMAL avg) ride the join
    // and the re-aggregation must equal the plain join — the oracle IS
    // the plain join, so no row is lost or duplicated by replication.
    "j9_salted_join" -> Q(
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        val dim = li.groupBy(col("l_returnflag"))
          .agg(round(sum(dec(col("l_quantity"))).cast("double") /
            count(lit(1)), 4).as("flag_avg"))
          .hint("shuffle_hash")
        Relational.saltedJoin(li, dim, Seq("l_returnflag"),
            salt = xxhash64(col("l_orderkey"), col("l_linenumber")),
            buckets = 16)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            min(col("flag_avg")).as("flag_avg"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""WITH d AS (SELECT l_returnflag,
              round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                AS DOUBLE) / count(*), 4) AS flag_avg
            FROM lineitem GROUP BY 1)
          SELECT l.l_returnflag, l.l_linestatus, count(*) AS cnt,
            CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              AS sum_qty,
            min(d.flag_avg) AS flag_avg
          FROM lineitem l JOIN d USING (l_returnflag)
          GROUP BY 1, 2 ORDER BY 1, 2""")),

    // j13: ADAPTIVE (partial) salted join — j9 at production cost, and
    // the loop-closer for a14's skew profile: only the profiled hot keys
    // (top-10 users by event count — deterministic, oracle-replayed)
    // salt into 8 buckets and replicate build-side; the cold majority
    // joins plain on salt 0, so the replication bill is |hot| × 8, not
    // |build| × 8. The oracle IS the plain join (salting must be
    // result-invisible), plus the hot-row mass per group so the row
    // proves the adaptive split actually partitioned the data it
    // claimed to.
    "j13_adaptive_salted_join" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
        val dim = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
          .hint("shuffle_hash")
        val hot = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("user_id")).limit(10)
          .select(col("user_id"))
        Relational.adaptiveSaltedJoin(
            ev.select("user_id", "event_type", "value", "event_id"), dim,
            Seq("user_id"), salt = xxhash64(col("event_id")), buckets = 8,
            hotKeys = hot)
          .join(broadcast(hot.withColumn("__h", lit(1))), Seq("user_id"),
            "left_outer")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("facts"),
            sum(dec(col("value"))).cast("double").as("value_sum"),
            sum(coalesce(col("__h"), lit(0))).cast("long").as("hot_facts"))
          .orderBy(col("event_type"))
      },
      Some("""WITH dim AS (SELECT user_id, min(epoch_ns(ts)) AS signup_ts
            FROM events WHERE event_type = 'signup' GROUP BY user_id),
          hot AS (SELECT user_id FROM (
            SELECT user_id, count(*) AS c FROM events GROUP BY user_id
            ORDER BY c DESC, user_id LIMIT 10)),
          j AS (SELECT e.event_type, e.value,
              CASE WHEN e.user_id IN (SELECT user_id FROM hot) THEN 1
                ELSE 0 END AS h
            FROM events e JOIN dim d ON e.user_id = d.user_id)
          SELECT event_type, count(*) AS facts,
            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
            CAST(sum(h) AS BIGINT) AS hot_facts
          FROM j GROUP BY event_type ORDER BY event_type""")),

    // A4: keyed distinct.
    "a4_distinct" -> Q(
      (s, dir) => T(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus""")),

    // A6: ceiling-division page count. Reference `perustats/MTC/homologacion.py:42-46`.
    "a6_ceil_paging" -> Q(
      (s, dir) => events(s, dir)
        .agg(ceil(count(lit(1)) / lit(1000.0)).cast("long").as("pages")),
      Some("SELECT CAST(ceil(count(*) / 1000.0) AS BIGINT) AS pages FROM events")),

    // U1: aligned union-all then aggregate.
    "u1_union_all" -> Q(
      (s, dir) => {
        val li = T(s, dir, "lineitem")
        li.filter(col("l_orderkey") % 2 === 0)
          .unionByName(li.filter(col("l_orderkey") % 2 =!= 0))
          .groupBy(col("l_returnflag"))
          .agg(sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
            count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        count(*) AS cnt
        FROM (SELECT * FROM lineitem WHERE l_orderkey % 2 = 0
              UNION ALL SELECT * FROM lineitem WHERE l_orderkey % 2 <> 0)
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // U2: schema-evolving diagonal union (missing columns -> null).
    "u2_diagonal_union" -> Q(
      (s, dir) => {
        val c = T(s, dir, "customer")
        Relational.unionDiagonal(Seq(
            c.select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
            c.select(col("c_custkey"), col("c_name"), col("c_acctbal"))))
          .groupBy(col("c_mktsegment").isNull.as("seg_null"),
            col("c_acctbal").isNull.as("bal_null"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("seg_null"), col("bal_null"))
      },
      Some("""SELECT c_mktsegment IS NULL AS seg_null,
          c_acctbal IS NULL AS bal_null, count(*) AS cnt
        FROM (SELECT c_custkey, c_name, c_mktsegment, NULL::DOUBLE AS c_acctbal
                FROM customer
              UNION ALL
              SELECT c_custkey, c_name, NULL::VARCHAR, c_acctbal FROM customer)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // U4: key-set intersection.
    "u4_intersect" -> Q(
      (s, dir) => T(s, dir, "supplier").select(col("s_suppkey").as("k"))
        .intersect(T(s, dir, "lineitem").select(col("l_suppkey").as("k")))
        .orderBy(col("k")),
      Some("""SELECT * FROM (
          SELECT s_suppkey AS k FROM supplier
          INTERSECT
          SELECT l_suppkey AS k FROM lineitem)
        ORDER BY k""")),

    // W1: global sort + limit (top-N by date).
    "w1_sort_topn" -> Q(
      (s, dir) => T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"),
          col("o_totalprice"))
        .orderBy(col("od").desc, col("o_orderkey"))
        .limit(100),
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od, o_totalprice
        FROM orders ORDER BY od DESC, o_orderkey LIMIT 100"""))
  )
}
