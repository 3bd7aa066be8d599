package graft

import org.apache.spark.sql.types._

/** Schema lint for the correctness gate's dumped outputs.
  *
  * The driver's checker loads each entry's parquet dump into pandas and
  * lexsorts every column to canonicalize row order before hashing. pandas
  * cannot lexsort a column of raw arrays/structs/maps (round-8 red
  * fmt_bedpe_scan: `Categorical(k, ordered=True)` → "unhashable type:
  * numpy.ndarray"), so a nested top-level column is a gate bug even when
  * the values are correct. This is the third dtype-trap class the gate
  * has hit (after Decimal-vs-double and CAST-rounds-vs-truncates); the
  * lint retires the class instead of remembering it: Verify fails an
  * entry loudly before dumping it, and GateLintSpec fails `sbt test`
  * before the driver ever sees it. Render nested values with
  * `array_join` / `to_json` / `concat_ws` in the gate projection.
  */
object GateLint {

  /** Names + types of top-level columns the driver's checker can't sort
    * or that trip the Decimal-vs-double dtype trap. DecimalType is
    * flagged too: the oracle-side lint (tools/check.py) already rejects
    * HUGEINT/DECIMAL oracle outputs, and a raw decimal column in the
    * Spark dump hash-mismatches the pandas checker the same way —
    * decimal-computed entries must CAST the final value back to BIGINT
    * (the hudsonFst/rel_hhi_by_segment discipline). */
  def uncheckableColumns(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] ||
        f.dataType.isInstanceOf[DecimalType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }

  /** Throws with the offending columns if the gate dump would be
    * unhashable for the driver's pandas checker. The remedy differs by
    * offender class, so the message branches: nested (array/map/struct)
    * columns must be rendered scalar; decimal columns must CAST the
    * final value back to BIGINT. */
  def assertCheckerSafe(entry: String, schema: StructType): Unit = {
    val bad = uncheckableColumns(schema)
    if (bad.nonEmpty) {
      val (decimals, nested) = bad.partition(_.contains("decimal"))
      val advice = Seq(
        if (nested.nonEmpty)
          Some("render nested columns scalar (array_join / to_json / concat_ws)")
        else None,
        if (decimals.nonEmpty)
          Some("CAST decimal columns' final value to BIGINT " +
            "(the hudsonFst/rel_hhi_by_segment discipline)")
        else None).flatten.mkString("; ")
      throw new IllegalArgumentException(
        s"gate entry '$entry' dumps top-level column(s) the driver's " +
          s"pandas checker cannot sort/hash: ${bad.mkString(", ")} — $advice")
    }
  }
}
