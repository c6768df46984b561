package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Schema-drift canary for the driver-generated fixtures.
  *
  * Round 5 lost ten live queries to a silent testdata regeneration
  * (`events.ts` flipped TIMESTAMP(NANOS) → `timestamp[us]`); every
  * failure surfaced as a confusing per-query DATATYPE_MISMATCH deep in
  * an expression tree. This canary asserts the physical type of every
  * fixture column the engine takes a dtype dependency on, and names the
  * drifted column in one line — run first by Verify (loud stderr
  * warning) and hard-gated by FixtureCanarySpec.
  *
  * `events.ts` accepts the two vintages the loader normalizes
  * (`Tables.tsToNanos`): Long nanos (nanosAsLong compat) and
  * timestamp/timestamp_ntz µs. Anything else is drift.
  */
object FixtureCanary {

  /** column -> admissible physical types (any match passes). */
  val Expected: Seq[(String, String, Set[DataType])] = Seq(
    ("events", "ts", Set[DataType](LongType, TimestampNTZType, TimestampType)),
    ("events", "event_id", Set[DataType](LongType)),
    ("events", "user_id", Set[DataType](LongType)),
    ("events", "value", Set[DataType](DoubleType)),
    ("events", "event_type", Set[DataType](StringType)),
    ("embeddings", "embedding", Set[DataType](ArrayType(FloatType), ArrayType(FloatType, containsNull = false))),
    ("embeddings", "vec_id", Set[DataType](LongType)),
    ("documents", "text", Set[DataType](StringType)),
    ("documents", "doc_id", Set[DataType](LongType)),
    // stratification/grouping keys for the corpus-management queries —
    // a string→dictionary or int-width flip would shift group hashing
    ("documents", "lang", Set[DataType](StringType)),
    ("documents", "source", Set[DataType](StringType)),
    ("documents", "n_chars", Set[DataType](LongType)),
    // star-schema columns compared against TIMESTAMP literals or summed
    // exactly — a date32/decimal flip here would shift semantics silently
    ("orders", "o_orderdate", Set[DataType](TimestampNTZType, TimestampType)),
    ("orders", "o_totalprice", Set[DataType](DoubleType)),
    ("orders", "o_custkey", Set[DataType](LongType)),
    ("lineitem", "l_shipdate", Set[DataType](TimestampNTZType, TimestampType)),
    ("lineitem", "l_quantity", Set[DataType](DoubleType)),
    ("customer", "c_custkey", Set[DataType](LongType)),
    ("customer", "c_nationkey", Set[DataType](IntegerType)))

  /** One drift message per mismatched column; empty = fixtures as
    * expected. Missing columns and unreadable tables are drift too.
    */
  def check(spark: SparkSession, sfDir: String): Seq[String] =
    Expected.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema =
        try Right(Tables.load(spark, sfDir, table).schema)
        catch { case e: Throwable => Left(s"table '$table' unreadable: ${e.getMessage}") }
      schema match {
        case Left(msg) => Seq(msg)
        case Right(sch) => cols.flatMap { case (_, name, admissible) =>
          sch.fields.find(_.name == name) match {
            case None => Some(s"$table.$name: column missing (fixture drift)")
            case Some(f) if !admissible.contains(f.dataType) =>
              Some(s"$table.$name: type ${f.dataType.sql} not in admissible " +
                admissible.map(_.sql).toSeq.sorted.mkString("{", ", ", "}") +
                " (fixture drift - update Tables/FixtureCanary together)")
            case _ => None
          }
        }
      }
    }
}
