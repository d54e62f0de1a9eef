package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational idioms as reusable `DataFrame => DataFrame`
  * operators (SURVEY §2.3–§2.6, §2.8). Every operator here is
  * shuffle-partitioned — no `collect()`, no driver-side loops — so each holds
  * at cluster scale; joins against small sides take explicit `broadcast`
  * hints at the call site when the caller knows the side is a dim table.
  */
object Relational {

  /** U1/U2: union a list of frames by column name; frames may have evolving
    * schemas (missing columns become nulls). Reference `pd.concat` /
    * polars diagonal concat (`perustats/infogob/11_locations_refs.py:19`). */
  def unionDiagonal(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** J2: incremental-resume anti join — rows of `all` whose key is absent
    * from `done`. The reference's core idiom
    * (`perustats/infogob/21_candidatos_by_eleccion.py:66-77`). */
  def pendingAntiJoin(all: DataFrame, done: DataFrame, keys: Seq[String]): DataFrame =
    all.join(done.select(keys.map(col): _*).dropDuplicates(keys), keys, "left_anti")

  /** J3: catalog validation — (valid, invalid) split of `requested` against
    * `catalog` membership on `key`. Reference
    * `perustats/BCRP/metadata.py:275-306`. The catalog side is deduplicated
    * and broadcast when small (caller hint). */
  def validateCodes(requested: DataFrame, catalog: DataFrame, key: String)
      : (DataFrame, DataFrame) = {
    val cat = catalog.select(key).dropDuplicates(key)
    (requested.join(cat, Seq(key), "left_semi"),
     requested.join(cat, Seq(key), "left_anti"))
  }

  /** J1/R3: wide-cache upsert — full-outer join `incoming` into `existing` on
    * `key`; shared value columns take the incoming value when present
    * (`coalesce(new, old)`), columns exclusive to one side pass through
    * (schema evolution: new series codes become new columns).
    *
    * Re-expresses the reference's whole-table outer merge
    * (`perustats/BCRP/cache.py:143-169`) as a keyed join so it distributes:
    * the shuffle is on `key` only and AQE can pick broadcast when one side is
    * small. Divergence policy vs. pandas natural-merge (SURVEY §7.4):
    * when old and new disagree on a shared column the NEW value wins and the
    * row stays unique — the pandas behavior of duplicating the row is a bug
    * for a cache.
    */
  def upsertWide(existing: DataFrame, incoming: DataFrame, key: String): DataFrame = {
    val oldCols = existing.columns.toSeq
    val newCols = incoming.columns.toSeq
    val shared = oldCols.intersect(newCols).filter(_ != key)
    val oldOnly = oldCols.diff(newCols).filter(_ != key)
    val newOnly = newCols.diff(oldCols).filter(_ != key)
    val joined = existing.alias("o").join(incoming.alias("n"), Seq(key), "full_outer")
    val projected: Seq[Column] =
      col(key) +:
        (shared.map(c => coalesce(col(s"n.$c"), col(s"o.$c")).as(c)) ++
         oldOnly.map(c => col(s"o.$c").as(c)) ++
         newOnly.map(c => col(s"n.$c").as(c)))
    joined.select(projected: _*)
  }

  /** S6/J1 composite-PK row upsert: incoming rows REPLACE existing rows
    * sharing their composite key; untouched existing rows pass through.
    * The infogob results-table write shape
    * (`perustats/infogob/20_resultados.py:49-87`: rows keyed by a
    * composite PRIMARY KEY, a refreshed fetch wins). One anti-join +
    * union — shuffles on the key columns only, so it distributes; AQE
    * broadcasts the incoming side when it is a small delta. */
  def upsertRows(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    // A retried fetch unioned with its first attempt yields EXACT
    // duplicate rows — full-row distinct drops them deterministically
    // (key-only dedup would pick an arbitrary payload). DISTINCT rows
    // sharing a key remain a caller error: no order exists to pick a
    // winner, and the SQL PRIMARY KEY this mirrors would reject them.
    val inc = incoming.dropDuplicates()
    pendingAntiJoin(existing, inc, keys).unionByName(inc)
  }

  /** A5: content-hash dedup — keep one row per distinct content hash.
    * Deterministic: the survivor is the row with the smallest `tieBreak`.
    * Reference `perustats/inei/organizer.py:199-248` (SHA-256 file dedup). */
  def dedupByHash(df: DataFrame, contentCols: Seq[String], tieBreak: String): DataFrame =
    keepFirst(df.withColumn("__h", sha2(concat_ws("\u0000", contentCols.map(col): _*), 256)),
      Seq("__h"), Seq(col(tieBreak))).drop("__h")

  /** Deterministic keyed dedup: first row per key under an explicit order. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** A2: stable batch index — group rows into fixed-size batches per
    * partition key, labeled `G_<key>_NNN`. Reference
    * `perustats/BCRP/archive/metadata.py:49-56` (cumcount // 120 + 1). */
  def batchIndex(df: DataFrame, partCol: String, order: Seq[Column],
      size: Int, out: String): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(order: _*)
    df.withColumn(out,
      format_string("G_%s_%03d", col(partCol),
        ((row_number().over(w) - 1) / size + 1).cast("int")))
  }

  /** Skew-safe two-phase sum: pre-aggregate on (keys, salt) so a hot key's
    * rows spread over `buckets` reducers before the final combine. With
    * associative exact aggregates (DECIMAL sums, counts) the result is
    * identical to the direct groupBy for ANY salt assignment — the salt
    * must still be deterministic (hash of a row-identifying column, never
    * rand()) so reruns and retries agree. Complements AQE's skew-join
    * handling, which does not cover aggregations.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
      salt: Column, buckets: Int, out: String): DataFrame = {
    val phase1 = df
      .withColumn("__salt", pmod(salt, lit(buckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__partial"), count(lit(1)).as("__cnt"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(out), sum(col("__cnt")).as(s"${out}_cnt"))
  }

  /** Skew-safe salted equi-join — the JOIN-level twin of [[saltedSum]]:
    * the fact side salts each row deterministically into `buckets`
    * sub-keys, the build side REPLICATES once per bucket, and the join
    * runs on (key, salt) — so a hot key's probe rows spread over
    * `buckets` tasks instead of one straggler. Result is exactly the
    * plain equi-join for any salt assignment (every fact row still meets
    * every matching build row exactly once — in its own bucket). Use
    * when the build side is too large to broadcast AND keys are hot;
    * complements AQE's skew-join splitting, which only kicks in above
    * its partition-size thresholds. Cost: build side × `buckets`
    * replication — keep the build side narrow. */
  def saltedJoin(fact: DataFrame, build: DataFrame, keys: Seq[String],
      salt: Column, buckets: Int): DataFrame = {
    val f = fact.withColumn("__salt",
      pmod(salt, lit(buckets)).cast("int"))
    val b = build.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i)): _*)))
    f.join(b, keys :+ "__salt").drop("__salt")
  }

  /** PARTIAL (adaptive) salting — [[saltedJoin]] at production cost: only
    * the keys in `hotKeys` (a SMALL set — a14's skew profile output, a
    * top-k count, an ops-supplied list — broadcast twice) salt and
    * replicate; the cold majority joins completely plain on salt 0. The
    * build-side replication bill drops from |build| × buckets to
    * |hot ∩ build| × buckets, which is what makes salting affordable
    * when the build side is large and only a handful of keys are hot —
    * the standard refinement over uniform salting, and the loop-closer
    * for the a14 profile (measure skew, salt exactly what it names).
    * Result is exactly the plain equi-join for any salt assignment:
    * every fact row meets every matching build row exactly once, in its
    * own bucket (cold: bucket 0; hot: its salted bucket, where the
    * replicated build row waits). Salt must be deterministic (hash of a
    * row-identifying fact column, never rand()). */
  def adaptiveSaltedJoin(fact: DataFrame, build: DataFrame,
      keys: Seq[String], salt: Column, buckets: Int,
      hotKeys: DataFrame): DataFrame = {
    val hot = hotKeys.select(keys.map(col): _*).distinct()
      .withColumn("__hot", lit(true))
    val f = fact.join(broadcast(hot), keys, "left_outer")
      .withColumn("__salt", when(col("__hot"),
        pmod(salt, lit(buckets)).cast("int")).otherwise(lit(0)))
      .drop("__hot")
    val b = build.join(broadcast(hot), keys, "left_outer")
      .withColumn("__salt", explode(when(col("__hot"),
        sequence(lit(0), lit(buckets - 1))).otherwise(array(lit(0)))))
      .drop("__hot")
    f.join(b, keys :+ "__salt").drop("__salt")
  }

  /** R1: long -> wide pivot of a series triple table. `first(value)` matches
    * the reference's one-value-per-(date, series) contract
    * (`perustats/BCRP/utils.py:130-137`). Callers pass `seriesValues` when
    * known so Spark skips the extra distinct-values job. */
  def pivotSeries(long: DataFrame, dateCol: String, seriesCol: String,
      valueCol: String, seriesValues: Seq[String] = Nil): DataFrame = {
    val g = long.groupBy(col(dateCol))
    val p = if (seriesValues.nonEmpty) g.pivot(seriesCol, seriesValues) else g.pivot(seriesCol)
    p.agg(first(col(valueCol), ignoreNulls = true))
  }

  /** R2: wide -> long unpivot (inverse of pivotSeries). */
  def unpivotSeries(wide: DataFrame, dateCol: String, seriesName: String,
      valueName: String): DataFrame = {
    val valueCols = wide.columns.filter(_ != dateCol)
    wide.unpivot(Array(col(dateCol)), valueCols.map(col), seriesName, valueName)
  }
}
