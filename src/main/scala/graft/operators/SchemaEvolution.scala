package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema evolution: apply a target schema to a frame, adding missing
  * columns with optional default values and optionally dropping extras.
  *
  * Re-expresses `prepare_schema`
  * (src/PandasETLHelpers/SCDHelpers.py:44-61): field identity is the
  * (name, dataType, nullable) triple; missing fields are appended as
  * `lit(default).cast(type)` (null default when none supplied); extra fields
  * are dropped only when `removeColumns` is set.
  *
  * Deviations recorded (documented intent over literal code, SURVEY.md
  * §7.4#5): (1) when a column exists under the same name with a different
  * type, the reference overwrites the data with the default literal and its
  * drop pass can then drop the column it just added; we cast the existing
  * data to the target type instead. (2) The reference iterates Python sets
  * (nondeterministic order); we pin target-schema field order.
  *
  * Pure plan surgery — literal columns constant-fold, casts are codegen'd;
  * no shuffle.
  */
object SchemaEvolution {

  def prepareSchema(
      df: DataFrame,
      newSchema: StructType,
      defaultValues: Map[String, Any] = Map.empty,
      removeColumns: Boolean = false): DataFrame = {
    // existence matching is CASE-INSENSITIVE, like Spark's own default
    // resolution: a case-sensitive set would classify a case-drifted
    // feed column ("UserName" vs target "username") as MISSING, and the
    // default-literal withColumn — which resolves case-insensitively —
    // would then silently REPLACE the existing column's data with the
    // default. The cast branch keeps the target's spelling.
    val oldFields = df.schema.fields
      .map(f => (f.name.toLowerCase, f.dataType, f.nullable)).toSet
    val existing = df.columns.map(_.toLowerCase).toSet

    val changed = newSchema.fields
      .filter(f => !oldFields.contains((f.name.toLowerCase, f.dataType, f.nullable)))
    val evolved = changed.foldLeft(df) { (acc, f) =>
      if (existing.contains(f.name.toLowerCase))
        acc.withColumn(f.name, col(f.name).cast(f.dataType))
      else acc.withColumn(f.name, lit(defaultValues.get(f.name).orNull).cast(f.dataType))
    }

    if (removeColumns) {
      val keep = newSchema.fieldNames.map(_.toLowerCase).toSet
      evolved.drop(evolved.columns.filterNot(c => keep.contains(c.toLowerCase)).toSeq: _*)
    } else evolved
  }
}
