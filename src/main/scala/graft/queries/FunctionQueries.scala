package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{dates, numeric, text}
import graft.ops.Relational
import QueryDSL._

/** SURVEY §2.7 scalar functions (F1–F18) and §2.8 reshape (R1–R2). Locale
  * fixtures (Spanish month labels, comma-grouped numerics) are inline VALUES
  * on both sides so the oracle pins exact expected literals.
  */
object FunctionQueries {

  val defs: Map[String, Q] = Map(

    // F1/F2: whitespace collapse + trim (+ upper-trim code normalization).
    "f1_normalize_ws" -> Q(
      (s, dir) => T(s, dir, "part").filter(col("p_partkey") < 50)
        .select(col("p_partkey"),
          text.normalizeWhitespace(concat(lit("  "), col("p_name"),
            lit("   "), col("p_brand"), lit(" "))).as("norm"),
          text.normalizeCode(concat(lit(" "), col("p_type"), lit(" "))).as("code"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
          trim(regexp_replace('  ' || p_name || '   ' || p_brand || ' ',
            '\s+', ' ', 'g')) AS norm,
          upper(trim(' ' || p_type || ' ')) AS code
        FROM part WHERE p_partkey < 50 ORDER BY p_partkey""")),

    // F3: title-case (single-word input; DuckDB has no initcap).
    "f3_initcap" -> Q(
      (s, dir) => T(s, dir, "nation")
        .select(col("n_nationkey"), initcap(col("n_name")).as("title"))
        .orderBy(col("n_nationkey")),
      Some("""SELECT n_nationkey,
          upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2)) AS title
        FROM nation ORDER BY n_nationkey""")),

    // F4: zero-pad codes. Reference `perustats/inei/fetcher.py:134`.
    "f4_zeropad" -> Q(
      (s, dir) => T(s, dir, "nation")
        .select(col("n_nationkey"),
          text.zeroPad(col("n_nationkey"), 4).as("padded"))
        .orderBy(col("n_nationkey")),
      Some("""SELECT n_nationkey, lpad(CAST(n_nationkey AS VARCHAR), 4, '0')
          AS padded
        FROM nation ORDER BY n_nationkey""")),

    // F5: unicode slugify (custom codegen'd expression) on an accented input.
    "f5_slugify" -> Q(
      (s, dir) => T(s, dir, "part").filter(col("p_partkey") < 50)
        .select(col("p_partkey"),
          text.slugify(concat(col("p_type"), lit(" Ñandú-Café 3"))).as("slug"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
          regexp_replace(trim(regexp_replace(
            lower(strip_accents(p_type || ' Ñandú-Café 3')),
            '[^a-z0-9 _-]', '', 'g')), ' +', '_', 'g') AS slug
        FROM part WHERE p_partkey < 50 ORDER BY p_partkey""")),

    // F6: filename sanitizer.
    "f6_sanitize" -> Q(
      (s, dir) => T(s, dir, "part").filter(col("p_partkey") < 50)
        .select(col("p_partkey"),
          text.sanitizeFilename(concat(col("p_name"), lit("?v2!.txt"))).as("fname"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
          regexp_replace(p_name || '?v2!.txt', '[^A-Za-z0-9 _-]', '_', 'g')
            AS fname
        FROM part WHERE p_partkey < 50 ORDER BY p_partkey""")),

    // F7+F8: Spanish-month / frequency-aware date parse on a locale fixture;
    // the oracle pins the exact expected dates (M/A -> period start,
    // Q -> quarter end + yq label).
    "f7f8_bcrp_dates" -> Q(
      (s, dir) => {
        import s.implicits._
        Seq(("15.Ene.23", "D"), ("03.Set.21", "D"), ("01.Dic.99", "D"),
            ("05.Ene.69", "D"), ("Ene.2023", "M"),
            ("Ago.1999", "M"), ("Q1.23", "Q"), ("Q4.09", "Q"),
            ("Q4.99", "Q"), ("Q1.69", "Q"), ("2023", "A"))
          .toDF("s", "freq")
          .withColumn("parsed",
            when(col("freq") === "D", dates.bcrpDate("D", col("s")))
              .when(col("freq") === "M", dates.bcrpDate("M", col("s")))
              .when(col("freq") === "Q", dates.bcrpDate("Q", col("s")))
              .otherwise(dates.bcrpDate("A", col("s"))))
          .withColumn("yq", when(col("freq") === "Q", dates.yqLabel(col("parsed")))
            .otherwise(lit(null).cast("string")))
          .orderBy(col("s"))
      },
      Some("""SELECT * FROM (VALUES
          ('15.Ene.23', 'D', DATE '2023-01-15', NULL),
          ('03.Set.21', 'D', DATE '2021-09-03', NULL),
          ('01.Dic.99', 'D', DATE '1999-12-01', NULL),
          ('05.Ene.69', 'D', DATE '1969-01-05', NULL),
          ('Ene.2023', 'M', DATE '2023-01-01', NULL),
          ('Ago.1999', 'M', DATE '1999-08-01', NULL),
          ('Q1.23', 'Q', DATE '2023-03-31', '2023Q1'),
          ('Q4.09', 'Q', DATE '2009-12-31', '2009Q4'),
          ('Q4.99', 'Q', DATE '1999-12-31', '1999Q4'),
          ('Q1.69', 'Q', DATE '1969-03-31', '1969Q1'),
          ('2023', 'A', DATE '2023-01-01', NULL))
        t(s, freq, parsed, yq) ORDER BY s""")),

    // F9: API date rendering per frequency (quarter histogram).
    "f9_api_format" -> Q(
      (s, dir) => T(s, dir, "orders")
        .select(dates.apiDateFormat("Q", col("o_orderdate")).as("q_str"))
        .groupBy(col("q_str")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("q_str")),
      Some("""SELECT CAST(year(o_orderdate) AS VARCHAR) || '-' ||
          CAST(quarter(o_orderdate) AS VARCHAR) AS q_str, count(*) AS cnt
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // F10: lenient numeric coercion fixture (thousands separators, percent,
    // garbage -> null).
    "f10_numeric_coercion" -> Q(
      (s, dir) => {
        import s.implicits._
        Seq("3,400,841.50", "12.5", "7%", "abc", " 1,000 ", "")
          .toDF("raw")
          .select(col("raw"), numeric.tryNumeric(col("raw")).as("parsed"))
          .orderBy(col("raw"))
      },
      Some("""SELECT * FROM (VALUES
          ('3,400,841.50', 3400841.5), ('12.5', 12.5), ('7%', 7.0),
          ('abc', NULL), (' 1,000 ', 1000.0), ('', NULL))
        t(raw, parsed) ORDER BY raw""")),

    // F11: coalesce by preference order.
    "f11_coalesce_pref" -> Q(
      (s, dir) => events(s, dir)
        .select(numeric.coalescePreferred(
          nullif(col("event_type"), lit("click")), lit("was_click")).as("kind"))
        .groupBy(col("kind")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("kind")),
      Some("""SELECT COALESCE(NULLIF(event_type, 'click'), 'was_click') AS kind,
          count(*) AS cnt
        FROM events GROUP BY 1 ORDER BY 1""")),

    // F12: conditional cascade (quantity bands).
    "f12_when_cascade" -> Q(
      (s, dir) => T(s, dir, "lineitem")
        .select(when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 25, "mid")
          .otherwise("high").as("band"))
        .groupBy(col("band")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("band")),
      Some("""SELECT CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 25 THEN 'mid' ELSE 'high' END AS band,
          count(*) AS cnt
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // F13: literal metadata tagging + union + group.
    "f13_lit_tag" -> Q(
      (s, dir) => {
        val r = T(s, dir, "region")
        r.withColumn("tag", lit("batch_a"))
          .unionByName(r.withColumn("tag", lit("batch_b")))
          .groupBy(col("tag")).agg(count(lit(1)).as("cnt"),
            sum(col("r_regionkey")).as("key_sum"))
          .orderBy(col("tag"))
      },
      Some("""SELECT tag, count(*) AS cnt, CAST(sum(r_regionkey) AS BIGINT) AS key_sum
        FROM (SELECT *, 'batch_a' AS tag FROM region
              UNION ALL SELECT *, 'batch_b' AS tag FROM region)
        GROUP BY tag ORDER BY tag""")),

    // F14: path construction from row fields.
    "f14_format_path" -> Q(
      (s, dir) => T(s, dir, "orders").filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          format_string("%d_mod_%s.zip", col("o_orderkey"), col("o_orderstatus"))
            .as("path"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, printf('%d_mod_%s.zip', o_orderkey, o_orderstatus)
          AS path
        FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""")),

    // F15: JSON field extraction + aggregate.
    "f15_json_extract" -> Q(
      (s, dir) => events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("cnt_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
          CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
          count(CAST(props->>'$.k' AS BIGINT)) AS cnt_k
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // F16: SHA-256 hex digest (matches DuckDB sha256 exactly).
    "f16_sha256" -> Q(
      (s, dir) => T(s, dir, "documents").filter(col("doc_id") < 10)
        .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, sha256(text) AS digest FROM documents
        WHERE doc_id < 10 ORDER BY doc_id""")),

    // F18: first-integer extraction.
    "f18_extract_int" -> Q(
      (s, dir) => T(s, dir, "orders")
        .select(text.extractInt(col("o_orderpriority")).as("prio"))
        .groupBy(col("prio")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("prio")),
      Some("""SELECT CAST(nullif(regexp_extract(o_orderpriority, '\d+', 0), '')
            AS BIGINT) AS prio, count(*) AS cnt
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // F19: higher-order array functions over the embedding vectors —
    // filter/exists/transform + strict-fold reductions, the codegen-free
    // HOF surface mirrored by DuckDB's list lambdas.
    "f19_array_hof" -> Q(
      (s, dir) => T(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          exists(col("embedding"), x => x > lit(0.2f)).as("has_large"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + abs(x.cast("double"))), 4).as("l1"))
        .orderBy(col("vec_id")),
      Some("""SELECT vec_id,
            CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
            len(list_filter(embedding, x -> x > CAST(0.2 AS FLOAT))) > 0
              AS has_large,
            round(list_reduce(list_transform(embedding,
              x -> abs(CAST(x AS DOUBLE))), (a, b) -> a + b), 4) AS l1
          FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""")),

    // R1: long -> wide pivot (explicit pivot values: no extra distinct job).
    "r1_pivot" -> Q(
      (s, dir) => T(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(dec(col("l_quantity"))).cast("double"))
        .orderBy(col("l_linestatus")),
      Some("""SELECT l_linestatus,
          CAST(sum(CASE WHEN l_returnflag = 'A'
            THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS A,
          CAST(sum(CASE WHEN l_returnflag = 'N'
            THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS N,
          CAST(sum(CASE WHEN l_returnflag = 'R'
            THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS R
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // R2: wide -> long unpivot (inverse of R1), nulls dropped as in the
    // reference's long form (a missing (date, series) simply has no row).
    "r2_unpivot" -> Q(
      (s, dir) => {
        val wide = T(s, dir, "lineitem")
          .groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum(dec(col("l_quantity"))).cast("double"))
        Relational.unpivotSeries(wide, "l_linestatus", "flag", "qty")
          .filter(col("qty").isNotNull)
          .orderBy(col("l_linestatus"), col("flag"))
      },
      Some("""SELECT l_linestatus, flag, qty FROM (
          SELECT l_linestatus, l_returnflag AS flag,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
          FROM lineitem GROUP BY l_linestatus, l_returnflag)
        WHERE qty IS NOT NULL ORDER BY l_linestatus, flag"""))
  )
}
