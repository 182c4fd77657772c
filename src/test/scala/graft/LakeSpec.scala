package graft

import org.apache.spark.sql.functions._

/** Filesystem-level assertions for `lake_compact_small_files` — the
  * oracle checks content preservation; this suite checks the part the
  * oracle can't see: the file layout actually compacted, the target
  * count followed the byte plan, and the compacted files are
  * range-clustered (pruning-friendly min/max).
  */
class LakeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(path: String): Array[java.io.File] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))

  test("compaction shrinks the file count to the byte-planned target, content intact") {
    val out = SparkEntry.queries("lake_compact_small_files")(spark, dir).collect()
    assert(out.length == 2)
    val byPhase = out.map(r => r.getAs[String]("phase") -> r).toMap
    // the two audit rows are identical apart from the phase label
    for (c <- Seq("n_rows", "sum_value", "min_id", "max_id", "n_types"))
      assert(byPhase("compacted").getAs[Any](c) == byPhase("fragmented").getAs[Any](c),
        s"audit column $c differs across phases")

    val sf = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current().pid()
    val frag = parquetFiles(s"/tmp/graft_compact/$sf/fragmented")
    val comp = parquetFiles(s"/tmp/graft_compact/$sf/compacted")
    assert(frag.length == 64, s"expected 64 fragments, got ${frag.length}")
    val planned = math.max(1,
      math.ceil(frag.map(_.length).sum / (8L << 20).toDouble).toInt)
    assert(comp.length == planned,
      s"compacted ${comp.length} files, planned $planned")
    assert(comp.length < frag.length, "compaction must reduce file count")

    // full row-level equality via anti-joins both ways
    val f = spark.read.parquet(s"/tmp/graft_compact/$sf/fragmented")
    val c = spark.read.parquet(s"/tmp/graft_compact/$sf/compacted")
    assert(f.exceptAll(c).isEmpty && c.exceptAll(f).isEmpty,
      "compacted content must equal fragmented content row-for-row")
  }

  test("compacted files are range-clustered: per-file key ranges do not interleave") {
    SparkEntry.queries("lake_compact_small_files")(spark, dir).collect()
    val sf = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current().pid()
    val comp = parquetFiles(s"/tmp/graft_compact/$sf/compacted")
    if (comp.length > 1) {
      // read each file's (event_type, event_id) min/max; ranges must be
      // disjoint under the clustering order
      val ranges = comp.map { file =>
        val df = spark.read.parquet(file.getAbsolutePath)
          .agg(min(struct(col("event_type"), col("event_id"))).as("lo"),
            max(struct(col("event_type"), col("event_id"))).as("hi")).head()
        (df.getStruct(0), df.getStruct(1))
      }.sortBy(r => (r._1.getString(0), r._1.getLong(1)))
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo, _)) =>
          val ok = hi.getString(0) < lo.getString(0) ||
            (hi.getString(0) == lo.getString(0) && hi.getLong(1) <= lo.getLong(1))
          assert(ok, s"file ranges interleave: $hi vs $lo")
        case _ =>
      }
    }
  }
}
