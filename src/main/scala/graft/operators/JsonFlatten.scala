package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recursive schema flattener — the Spark-first re-expression of the
  * reference's `flatten_json` (pandas `json_normalize` + joining list
  * cells into comma-separated strings; normalize_parks_json.py:40-47).
  *
  * Struct fields expand to `parent.child` columns; array fields fold
  * into `", "`-joined strings. Purely declarative: the whole expansion
  * is one `select` of codegen'd column expressions, so Catalyst still
  * prunes unused leaves at the parquet scan.
  */
object JsonFlatten {
  private def leafColumns(prefix: String, c: Column, t: DataType): Seq[(String, Column)] =
    t match {
      case st: StructType =>
        st.fields.toSeq.flatMap(f => leafColumns(s"$prefix.${f.name}", c.getField(f.name), f.dataType))
      case _: ArrayType =>
        Seq(prefix -> array_join(c.cast(ArrayType(StringType)), ", "))
      case _ => Seq(prefix -> c)
    }

  /** Flatten every struct/array column of `df` (non-nested columns pass
    * through unchanged, names preserved).
    */
  def flatten(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case _: StructType | _: ArrayType => leafColumns(f.name, col(f.name), f.dataType)
        case _ => Seq(f.name -> col(f.name))
      }
    }
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
  }
}
