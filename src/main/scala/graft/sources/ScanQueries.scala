package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 Scans / sources / sinks.
  *
  * scan_project / scan_pushdown are written so Catalyst pushes the
  * projection and predicate into the vectorized parquet reader (verified
  * via explain in ScanSpec) — at 100 TB these queries read only the
  * referenced columns / row groups, not the table.
  *
  * Roundtrip queries write to a session-scoped temp dir: this tests the
  * CSV/JSON source+sink code paths; the oracle reads the original parquet
  * (the roundtrip is lossless for int/string columns).
  */
object ScanQueries {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_rt/$name"

  /** Hive-partitioned orders staging, written once per (JVM, sfDir) and
    * shared by scan_partition_prune and join_dpp — their declared
    * behavior is the PRUNED READ (static and dynamic); the write path
    * itself is sink_parquet_partitioned's contract.
    */
  private val stagedPrune = scala.collection.concurrent.TrieMap[String, String]()
  private def ordersByPrioDir(s: org.apache.spark.sql.SparkSession, dir: String): String =
    stagedPrune.getOrElseUpdate(dir, {
      val path = tmp(s"orders_by_prio_${Integer.toHexString(dir.hashCode)}")
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .repartition(col("o_orderpriority"))
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
      path
    })

  /** Morton (Z-order) code: min-max scale two keys onto an 8-bit grid,
    * then interleave the bits. The scaling step is what makes Z-order
    * work on mismatched domains — without it the wider column's high
    * bits dominate every range split and the narrow column never
    * clusters (measured: suppkey spans did not shrink at all). Pure
    * shift/mask arithmetic after scaling — stays inside whole-stage
    * codegen, no UDF. Production z-order writers (Delta/Iceberg-style)
    * do the same normalization from table stats.
    */
  private[sources] def zval(a: org.apache.spark.sql.Column, aMin: Long, aMax: Long,
                            b: org.apache.spark.sql.Column, bMin: Long, bMax: Long)
      : org.apache.spark.sql.Column = {
    def grid(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      ((c.cast("long") - lit(lo)) * lit(255L) / lit(math.max(hi - lo, 1L))).cast("long")
    val (ga, gb) = (grid(a, aMin, aMax), grid(b, bMin, bMax))
    (0 until 8).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(ga, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(gb, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  val queries: Map[String, Q] = Map(
    "scan_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (Tables.dec2(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(4,2)"))).cast("double").as("net"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "scan_pushdown" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "src_csv_roundtrip" -> ((s, dir) => {
      val path = tmp("nation_csv")
      Tables.nation(s, dir).write.mode("overwrite").option("header", "true").csv(path)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      s.read.schema(schema).option("header", "true").csv(path)
        .orderBy(col("n_nationkey"))
    }),

    // robust ingest: PERMISSIVE CSV read over a directory that contains
    // two injected malformed lines (a type error and a short row). Bad
    // rows land in the corrupt-record column instead of failing the
    // batch — the quarantine pattern for untrusted feeds; the declared
    // result proves exactly the injected rows (and no others) were
    // quarantined. At 100 TB mode=FAILFAST is a single poison row
    // killing the job; PERMISSIVE + a corrupt-row sink is the shape.
    "src_csv_permissive" -> ((s, dir) => {
      val path = tmp("nation_csv_bad")
      Tables.nation(s, dir).write.mode("overwrite").csv(path)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path, "part-zz-bad.csv"),
        "notanint,BROKEN,99\n42,TOOFEW\n".getBytes("UTF-8"))
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType),
        StructField("_bad", StringType)))
      // Spark disallows queries whose referenced columns reduce to the
      // internal corrupt-record column alone; the documented workaround
      // is to materialize the parsed rows first (tiny quarantine frame
      // here — and at scale you persist the parse result anyway before
      // splitting good rows from the quarantine sink)
      val parsed = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(path)
        .cache()
      parsed
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_bad"),
          sum(when(col("_bad").isNull, 1L).otherwise(0L)).as("n_good"))
    }),

    // recursive directory ingest with a glob filter: sweep every parquet
    // part under a nested hive layout WITHOUT partition inference
    // (recursiveFileLookup drops the directory-derived columns — the
    // raw-sweep mode for auditing exactly what bytes are on disk)
    "scan_glob_filter" -> ((s, dir) => {
      val path = ordersByPrioDir(s, dir)
      s.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(path)
        .agg(count(lit(1)).as("n_rows"),
          sum(Tables.dec2(col("o_totalprice"))).cast("double").as("total"))
    }),

    "src_json_roundtrip" -> ((s, dir) => {
      val path = tmp("region_json")
      Tables.region(s, dir).write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType)))
      s.read.schema(schema).json(path)
        .select(col("r_regionkey"), col("r_name"))
        .orderBy(col("r_regionkey"))
    }),

    // ORC source+sink path (the second columnar format Spark ships with
    // a vectorized reader for); lossless for int/string/double columns
    "src_orc_roundtrip" -> ((s, dir) => {
      val path = tmp("supplier_orc")
      Tables.supplier(s, dir).write.mode("overwrite").orc(path)
      s.read.orc(path)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          Tables.dec2(col("s_acctbal")).cast("double").as("s_acctbal"))
        .orderBy(col("s_suppkey"))
    }),

    // text source+sink path (raw-corpus ingest: one line per record, the
    // format crawl dumps and log shippers actually deliver). Write
    // tab-framed lines, read them back with spark.read.text, and re-split
    // — the split is codegen substring arithmetic, not a regex. The
    // declared output proves the roundtrip is byte-lossless (doc ids and
    // char counts survive).
    "src_text_roundtrip" -> ((s, dir) => {
      val path = tmp("docs_text")
      Tables.documents(s, dir)
        .select(concat_ws("\t", col("doc_id"), col("text")))
        .write.mode("overwrite").text(path)
      s.read.text(path)
        .select(
          substring_index(col("value"), "\t", 1).cast("long").as("doc_id"),
          expr("substring(value, instr(value, '\t') + 1)").as("text"))
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_rt"))
        .orderBy(col("doc_id"))
    }),

    // custom DataSource V2 WRITE path (graft.sources.v2.CsvSink): tasks
    // stream to temp files, task-commit renames them to job-unique
    // STAGED names, and the driver commit atomically swaps in a MANIFEST
    // only after every task succeeded — the exactly-once two-phase
    // protocol (a failed job's abort leaves the previous generation
    // intact; see CsvSink's crash matrix). The declared result reads the
    // manifest-LISTED files back (readers trust the manifest, never a
    // directory glob) and cross-checks the row accounting in-band.
    "sink_custom_v2" -> ((s, dir) => {
      val path = tmp("v2_sink")
      Tables.orders(s, dir)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .select(col("o_custkey").as("key"), col("n"))
        .write.format("graft.sources.v2.CsvSink")
        .option("path", path).mode("overwrite").save()
      // control-plane read: one tiny manifest file on the driver
      val committed = graft.sources.v2.CsvSink.committedFiles(path)
      val data = s.read.schema("key LONG, n LONG").csv(committed: _*)
      val man = s.read.text(s"$path/MANIFEST")
        .select(split(col("value"), ",").getItem(1).cast("long").as("rows"))
        .agg(sum(col("rows")).as("manifest_rows"))
      data.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("total_orders"))
        .crossJoin(man)
        .select(col("n_keys"), col("total_orders"),
          (col("manifest_rows") === col("n_keys")).as("manifest_matches"))
    }),

    // custom DataSource V2 connector (graft.sources.v2.SeqDataSource):
    // the id-range filter is ABSORBED into the source's generator bounds
    // (pushFilters returns no residual) and the projection reaches the
    // reader (pruneColumns) — the full connector read contract, scanned
    // in 8 parallel partitions. PlanSpec asserts the pushed range via
    // the scan description.
    "src_custom_v2" -> ((s, dir) => {
      s.read.format("graft.sources.v2.SeqDataSource")
        .option("rows", "200000").option("parts", "8").load()
        .filter(col("id") >= 150000L && col("id") < 190000L)
        .groupBy(col("cat"))
        .agg(count(lit(1)).as("n"), sum(col("val")).as("sum_val"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .orderBy(col("cat"))
    }),

    // binaryFile source: the raw-asset ingest path (images/audio land
    // as whole files before any decode). Stage one text file per doc
    // (partitionBy write), then read the directory tree back as opaque
    // (path, length, content) rows — the same schema a 100 TB media
    // crawl presents. Declared result pins byte length (= chars + the
    // sink's trailing newline) and a content prefix, proving payloads
    // arrive intact; binaryFile never splits a file across tasks, so
    // partition granularity is the file, as a decode stage needs.
    "src_binary_files" -> ((s, dir) => {
      val path = tmp("docs_binfiles")
      Tables.documents(s, dir)
        .filter(col("doc_id") < 20)
        .select(col("text"), col("doc_id"))
        .write.mode("overwrite").partitionBy("doc_id").text(path)
      s.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.txt")
        .load(path)
        .select(
          regexp_extract(col("path"), "doc_id=(\\d+)", 1).cast("long").as("doc_id"),
          col("length").as("bin_len"),
          substring(col("content").cast("string"), 1, 10).as("head10"))
        .orderBy(col("doc_id"))
    }),

    // static partition pruning: write hive-partitioned parquet, read back
    // with a literal partition predicate. At 100 TB the filter must never
    // touch non-matching partitions — the scan lists 1 of 5 directories
    // (PartitionFilters in the plan, asserted in PlanSpec), so cost is
    // proportional to the selected partition, not the table.
    "scan_partition_prune" -> ((s, dir) => {
      s.read.parquet(ordersByPrioDir(s, dir))
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // dynamic partition pruning: the partition predicate is only known at
    // runtime (it comes from the dim side of a join). Catalyst plants a
    // DynamicPruningSubquery on the fact scan, so at 100 TB the fact table
    // reads only the partitions the filtered dim actually selects —
    // without the user ever writing the partition filter. Plan-asserted.
    "join_dpp" -> ((s, dir) => {
      val fact = s.read.parquet(ordersByPrioDir(s, dir))
      val dim = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("pr")).distinct()
        .filter(col("pr").isin("1-URGENT", "2-HIGH"))
      fact.join(dim, col("o_orderpriority") === col("pr"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(Tables.dec2(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // schema evolution read: two parquet batches with different schemas
    // (the second adds a column) merged by the reader — the lakehouse
    // append-with-new-column case. mergeSchema unions the footers;
    // missing columns surface as NULLs, never as read errors.
    // hidden `_metadata` file columns (Spark 3.4+): per-row provenance
    // (source file name/size) with NO extra scan or join — the lineage
    // primitive for audit trails and selective reprocessing ("which
    // files produced these bad rows"). Constant per input split, so at
    // 100 TB it adds a per-partition constant, not a per-row cost.
    "scan_file_metadata" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"),
          col("_metadata.file_name").as("fname"),
          col("_metadata.file_size").as("fsize"))
        .agg(countDistinct(col("fname")).as("n_files"),
          count(lit(1)).as("n_rows"),
          min(col("fname")).as("file_name"),
          bool_and(col("fsize") > 0).as("sizes_positive"))
    }),

    "scan_schema_merge" -> ((s, dir) => {
      val path = tmp("nation_evolve")
      val n = Tables.nation(s, dir)
      n.select(col("n_nationkey"), col("n_name"))
        .where(col("n_nationkey") % 2 === 0)
        .write.mode("overwrite").parquet(s"$path/batch=old")
      n.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .where(col("n_nationkey") % 2 === 1)
        .write.mode("overwrite").parquet(s"$path/batch=new")
      s.read.option("mergeSchema", "true").parquet(path)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }),

    // XML source+sink path (Spark 4 ships the former spark-xml as a
    // built-in format). Write one <row> element per customer, read back
    // with an explicit schema (rowTag streaming parse — each element is
    // parsed independently, so the read scales out like any text source).
    // Declared output proves values and string escaping survive.
    "src_xml_roundtrip" -> ((s, dir) => {
      val path = tmp("customer_xml")
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
        .write.mode("overwrite").format("xml")
        .option("rootTag", "customers").option("rowTag", "row").save(path)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_mktsegment", StringType)))
      s.read.schema(schema).option("rowTag", "row").format("xml").load(path)
        .orderBy(col("c_custkey"))
    }),

    // Z-order clustered sink: interleave the bits of (l_partkey,
    // l_suppkey) and range-partition + locally sort the write on that
    // Morton code. Every output file then covers a tight rectangle of
    // the 2-D key space, so a box predicate on EITHER OR BOTH columns
    // skips most files/row-groups via parquet min/max stats — the
    // standard lakehouse layout for multi-column data skipping at
    // 100 TB, where a single-column sort only helps its own column.
    // ScanSpec asserts the clustering is real (per-file key spans shrink
    // vs the unclustered layout) and that both range predicates reach
    // PushedFilters. Declared output: the box aggregate, by returnflag.
    "sink_zorder" -> ((s, dir) => {
      val path = tmp("li_zorder")
      // key-domain stats for the grid scaling: a 4-long control-plane
      // lookup (the write-side analog of ANALYZE stats), not data flow
      val stats = Tables.lineitem(s, dir)
        .agg(min(col("l_partkey")).cast("long"), max(col("l_partkey")).cast("long"),
          min(col("l_suppkey")).cast("long"), max(col("l_suppkey")).cast("long")).head
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_returnflag"))
        .withColumn("z", zval(
          col("l_partkey"), stats.getLong(0), stats.getLong(1),
          col("l_suppkey"), stats.getLong(2), stats.getLong(3)))
        .repartitionByRange(8, col("z"))
        .sortWithinPartitions(col("z"))
        .drop("z")
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .filter(col("l_partkey").between(0, 39) && col("l_suppkey").between(0, 3))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(Tables.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    "sink_parquet_partitioned" -> ((s, dir) => {
      val path = tmp("li_part")
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        // co-locate each output partition into one task → 3 files instead
        // of tasks×3 tiny files (and a 4× faster read-back)
        .repartition(col("l_returnflag"))
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
      s.read.parquet(path)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(Tables.dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracle: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_returnflag
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "src_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "scan_glob_filter" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders""".stripMargin,

    "src_csv_permissive" ->
      """SELECT count(*) + 2 AS n_rows, CAST(2 AS BIGINT) AS n_bad,
        |  count(*) AS n_good FROM nation""".stripMargin,

    "src_json_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "src_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "sink_custom_v2" ->
      """SELECT count(DISTINCT o_custkey) AS n_keys,
        |  count(*) AS total_orders,
        |  true AS manifest_matches
        |FROM orders""".stripMargin,

    "src_custom_v2" ->
      """SELECT 'c' || (i % 5) AS cat, count(*) AS n,
        |  CAST(sum((i * 31 + 7) % 997) AS BIGINT) AS sum_val,
        |  min(i) AS min_id, max(i) AS max_id
        |FROM generate_series(150000, 189999) t(i)
        |GROUP BY cat ORDER BY cat""".stripMargin,

    "src_binary_files" ->
      """SELECT doc_id,
        |  CAST(length(text) + 1 AS BIGINT) AS bin_len,
        |  substring(text, 1, 10) AS head10
        |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin,

    "src_text_roundtrip" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_rt
        |FROM documents ORDER BY doc_id""".stripMargin,

    "scan_partition_prune" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,

    "join_dpp" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the testdata table is exactly one parquet file with a fixed name
    "scan_file_metadata" ->
      """SELECT CAST(1 AS BIGINT) AS n_files, count(*) AS n_rows,
        |  'lineitem.parquet' AS file_name, true AS sizes_positive
        |FROM lineitem""".stripMargin,

    "scan_schema_merge" ->
      """SELECT n_nationkey, n_name,
        |  CASE WHEN n_nationkey % 2 = 1 THEN n_regionkey END AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "src_xml_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "sink_zorder" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
        |FROM lineitem
        |WHERE l_partkey BETWEEN 0 AND 39 AND l_suppkey BETWEEN 0 AND 3
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "sink_parquet_partitioned" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
