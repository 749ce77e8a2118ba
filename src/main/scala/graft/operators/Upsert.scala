package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable MERGE on plain parquet DataFrames — the engine behind the
  * reference's Excel-upload upsert flow (`app.py:6063-6300`: read the
  * workbook, update matching registry keys, insert the rest). q29 is
  * the oracle-checked instance of this plan shape; this generalizes
  * it so any (base, updates) pair merges: a full-outer join on the
  * key, update columns winning where present.
  *
  * Scale shape: one key-partitioned shuffle on each side (or zero if
  * both are bucketed on the key — see Readers.writeBucketed); updates
  * are usually tiny and broadcast automatically under AQE.
  */
object Upsert {

  /** Merge `updates` into `base` by `key`. Columns present in both:
    * the update value wins on matched keys (null update fields keep
    * the base value). Columns only in base keep their value (null for
    * inserted rows). Update-only columns are ignored.
    */
  def merge(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val updCols = updates.columns.toSet
    val u = updates.columns.foldLeft(updates) { (df, c) =>
      df.withColumnRenamed(c, s"__u_$c")
    }
    val joined = base.join(u, base(key) === u(s"__u_$key"), "full_outer")
    val out = base.columns.map { c =>
      if (c == key) coalesce(base(key), u(s"__u_$key")).as(key)
      else if (updCols.contains(c)) coalesce(u(s"__u_$c"), base(c)).as(c)
      else base(c).as(c)
    }
    joined.select(out.toIndexedSeq: _*)
  }
}
