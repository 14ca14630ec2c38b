package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) corpus ingestion — the interchange
  * format most raw LLM training corpora arrive in (one document
  * object per line, nested metadata).
  *
  * Two non-negotiables at 100 TB:
  *  - **Explicit schema, never inference.** `spark.read.json` without
  *    a schema runs a full extra pass over every byte just to guess
  *    types (and guesses differently as the corpus grows — a new
  *    nested key anywhere changes the schema for everyone).
  *  - **Quarantine, don't crash or drop.** Real corpora carry
  *    truncated/garbled lines; FAILFAST kills a 10-hour job on one
  *    bad byte and DROPMALFORMED silently changes corpus statistics.
  *    PERMISSIVE keeps every malformed line as a row with the raw
  *    text in `corruptCol` and all data fields null — the same
  *    split-and-account discipline as the CSV validity family
  *    (SURVEY.md §2.2 P3-P5).
  */
object JsonlIngest {

  /** Read a JSONL file/directory with an explicit (possibly nested)
    * schema; malformed lines surface as rows whose `corruptCol`
    * holds the raw line and whose data fields are null. Filter
    * `col(corruptCol).isNull` for the clean side, its negation for
    * the quarantine sink. (Spark caveat: a projection of ONLY the
    * corrupt column is disallowed — keep at least one data column in
    * any quarantine write, which the accounting wants anyway.) */
  def read(spark: SparkSession, path: String, schema: StructType,
           corruptCol: String = "_corrupt"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a '$corruptCol' column")
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }
}
