package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** The INEI organize stage (SURVEY §3.2 step 3) as pure metadata
  * transforms: given a frame of extracted files, compute the organized
  * layout — size-ranked data-file names, collision-suffixed doc names, and
  * content-hash dedup of documentation. The actual file moves are a trivial
  * driver-side `foreach` over the tiny result; all decisions distribute.
  * Reference `perustats/inei/organizer.py:98-248` (W4/W5/A5 composition).
  */
object INEIOrganize {

  /** W4: data files ranked by size (desc) within their (year, module)
    * folder and renamed `{year}_mod_{module}_{rank}`. Reference
    * `perustats/inei/organizer.py:165-174`. */
  def rankDataFiles(files: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("year"), col("moduleCode"))
      .orderBy(col("sizeBytes").desc, col("fileName"))
    files.withColumn("rank", row_number().over(w))
      .withColumn("organizedName",
        format_string("%d_mod_%s_%d", col("year"), col("moduleCode"),
          col("rank")))
  }

  /** W5: documentation files keep their base name, suffixed `_N` on
    * collisions (arrival order = file name). Reference
    * `perustats/inei/organizer.py:176-191`. */
  def suffixCollisions(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("folder"), col("fileName"))
      .orderBy(col("year"), col("moduleCode"))
    docs.withColumn("n", row_number().over(w))
      .withColumn("organizedName",
        when(col("n") === 1, col("fileName"))
          .otherwise(format_string("%s_%d", col("fileName"), col("n"))))
      .drop("n")
  }

  /** A5: documentation dedup — keep one file per content hash (smallest
    * name wins). Reference `perustats/inei/organizer.py:199-248`. */
  def dedupDocs(docs: DataFrame): DataFrame =
    Relational.keepFirst(docs, Seq("sha256"), Seq(col("fileName")))
}
