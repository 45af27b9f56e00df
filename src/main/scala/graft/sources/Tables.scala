package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink surface of the engine (SURVEY.md §2.1, S1-S6).
  *
  * The reference ingests raw CSV with explicit, enforced `StructType`s
  * (fail-fast on type mismatch — reference 01_bronze_ingest.py:36-86) and
  * persists every layer as columnar tables written with idempotent
  * overwrite, optionally partitioned for downstream partition pruning
  * (reference 03_gold_metrics.py:93-98). Delta Lake jars are not available
  * offline, so layer tables are Parquet directories with identical
  * overwrite/partitionBy semantics (SURVEY.md §1).
  *
  * Scale notes (100 TB): all reads are plain `spark.read` so Catalyst
  * handles predicate pushdown / column pruning / partition pruning; writes
  * partitionBy low-cardinality columns only (partition explosion kills the
  * driver at scale); no `.collect()` anywhere in the IO layer.
  */
object Tables {

  /** Event-time columns per testdata table. The harness regenerates the
    * parquet drops between rounds and has already drifted the PHYSICAL
    * timestamp encoding once (events.ts: TIMESTAMP(NANOS) → NTZ micros,
    * which broke 12 queries in r6) — every temporal column, not just
    * events.ts, gets the same inspect-don't-assume normalization. */
  private val temporalCols = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events" -> Seq("ts"))

  /** Load one driver-generated testdata table (TESTDATA.md),
    * schema-adaptively normalized so every downstream query sees ONE
    * logical shape regardless of the physical encoding the current
    * testdata drop shipped:
    *  - temporal columns → session-TZ TimestampType, whatever the file
    *    held: NANOS (read as long via the legacy conf — exact integer
    *    `DIV 1000`, since ns epochs ~1.7e18 exceed a double's 2^53),
    *    NTZ/UTC micros, DATE (midnight, matching DuckDB's date→ts
    *    promotion), or an ISO string;
    *  - `documents.text` shipped as binary → UTF-8 string (the text
    *    kernels and the DuckDB oracle both treat it as text);
    *  - `events.props` shipped pre-parsed (struct/map) → canonical JSON
    *    string, which is what the JSON-extraction queries parse.
    * With the current drop every branch is a no-op passthrough — the
    * cost is one schema inspection per read, no plan change. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // a NANOS column would otherwise fail the whole read ([PARQUET_TYPE_ILLEGAL])
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // memoized (path, mtime) schema: a testdata drop is immutable within
    // a run, and plain `spark.read.parquet` pays a footer-inference
    // listing + Spark job per CONSTRUCTION — once per query across a
    // 240-query bench (guide §1 profiling; same memo version dirs use)
    var df = spark.read
      .schema(VersionedTable.parquetDirSchema(spark, s"$sfDir/$name.parquet"))
      .parquet(s"$sfDir/$name.parquet")
    for (c <- temporalCols.getOrElse(name, Nil) if df.columns.contains(c)) {
      df.schema(c).dataType match {
        case TimestampType => ()
        case TimestampNTZType | DateType | StringType =>
          df = df.withColumn(c, col(c).cast(TimestampType))
        case LongType => // legacy NANOS read as long → rebuild micros
          df = df.withColumn(c, timestamp_micros(expr(s"$c DIV 1000")))
        case other =>
          throw new IllegalStateException(s"unexpected $name.$c dtype: $other")
      }
    }
    if (name == "documents" && df.schema("text").dataType == BinaryType)
      df = df.withColumn("text", col("text").cast(StringType))
    if (name == "events") df.schema("props").dataType match {
      case StringType => ()
      case _: StructType | _: MapType =>
        df = df.withColumn("props", to_json(col("props")))
      case other =>
        throw new IllegalStateException(s"unexpected events.props dtype: $other")
    }
    df
  }

  /** Embeddings table with the vector column normalized to a dtype the
    * similarity kernels accept — schema-adaptive like
    * [[graft.queries.EventQueries.events]], so a regenerated testdata
    * drop that switches the embedding encoding cannot break the
    * ANN/dedup family the way the r6 events timestamp drift broke the
    * time-series family. float and double pass through UNCHANGED (the
    * kernels dispatch on both): truncating a double file to float here
    * would diverge from the DuckDB oracle, which reads the same parquet
    * at full precision — the drift this helper exists to prevent. Only
    * an integral-element file (never shipped; defensive) widens, to
    * float. */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = {
    val df = t(spark, sfDir, "embeddings")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType | DoubleType, _) => df
      case ArrayType(_: NumericType, _) =>
        df.withColumn("embedding", col("embedding").cast("array<float>"))
      case other =>
        throw new IllegalStateException(s"unexpected embedding dtype: $other")
    }
  }

  /** CSV scan with header + enforced schema, failing fast on malformed
    * rows — reference 01_bronze_ingest.py:81-86 uses mode default
    * PERMISSIVE on Databricks but README.md:69 documents "invalid types
    * fail fast"; FAILFAST realizes the documented contract. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)

  /** Idempotent full-refresh overwrite — reference 01_bronze_ingest.py:96-102. */
  def overwrite(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Partitioned sink for downstream partition pruning — reference
    * 03_gold_metrics.py:93-98 (`partitionBy("eval_set")`). Keep partition
    * columns low-cardinality: at 100 TB a high-cardinality partitionBy
    * creates millions of files and breaks the scan planner. */
  def overwritePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Bronze-layer metadata columns — reference 01_bronze_ingest.py:89-93. */
  def withBronzeMeta(df: DataFrame, sourceFile: String, version: String): DataFrame =
    df.withColumns(Map(
      "_ingested_at" -> current_timestamp(),
      "_source_file" -> lit(sourceFile),
      "_bronze_version" -> lit(version)))

  /** Strip bronze metadata on entry to Silver — reference 02_silver_transform.py:55. */
  def dropBronzeMeta(df: DataFrame): DataFrame =
    df.drop("_ingested_at", "_source_file", "_bronze_version")
}

/** Enforced schemas for the reference's five raw sources
  * (reference 01_bronze_ingest.py:36-68; FIXTURES.md §A.1). */
object InstacartSchemas {
  val orders: StructType = StructType(Seq(
    StructField("order_id", IntegerType, nullable = false),
    StructField("user_id", IntegerType, nullable = false),
    StructField("eval_set", StringType, nullable = false),
    StructField("order_number", IntegerType, nullable = false),
    StructField("order_dow", IntegerType, nullable = false),
    StructField("order_hour_of_day", IntegerType, nullable = false),
    // null = first order for the user (reference 01:43, README.md:77)
    StructField("days_since_prior_order", FloatType, nullable = true)))

  val orderProducts: StructType = StructType(Seq(
    StructField("order_id", IntegerType, nullable = false),
    StructField("product_id", IntegerType, nullable = false),
    StructField("add_to_cart_order", IntegerType, nullable = false),
    StructField("reordered", IntegerType, nullable = false)))

  val products: StructType = StructType(Seq(
    StructField("product_id", IntegerType, nullable = false),
    StructField("product_name", StringType, nullable = false),
    StructField("aisle_id", IntegerType, nullable = false),
    StructField("department_id", IntegerType, nullable = false)))

  val aisles: StructType = StructType(Seq(
    StructField("aisle_id", IntegerType, nullable = false),
    StructField("aisle", StringType, nullable = false)))

  val departments: StructType = StructType(Seq(
    StructField("department_id", IntegerType, nullable = false),
    StructField("department", StringType, nullable = false)))
}
