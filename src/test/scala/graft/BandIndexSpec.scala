package graft

import graft.operators.BandIndexStore
import org.apache.spark.sql.functions._

/** The persistent band index (q125's corpus side as storage layout):
  * build writes cell-partitioned parquet; probe must find EXACTLY what
  * q125's inline derivation finds, through a partition-PRUNED scan — the
  * "incremental dedup at 100 TB" claim made physical (files in cells the
  * batch doesn't touch never open). */
class BandIndexSpec extends SparkSpec {

  private val isNew = col("doc_id") % 10 === 7

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("bandidx").toString
    BandIndexStore.build(spark, sf, !isNew, d)
    d
  }

  test("probe over the persisted index == q125's inline derivation") {
    val got = BandIndexStore.probe(spark, sf, isNew, dir).collect()
    val want = QueryRegistry.byName("q125_incremental_neardup")
      .fn(spark, sf).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("tiny-batch probe reads only the band cells the batch touches") {
    // one-doc batch: touches at most NumBands cells of the 32-cell store —
    // the pruning regime a small ingest batch lives in
    val oneDoc = col("doc_id") === 7
    val probed = BandIndexStore.probe(spark, sf, oneDoc, dir)
    val plan = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"store cell filter did not become a partition filter:\n$plan")
    // the store spreads over many cells, the probe touches few
    val store = spark.read.parquet(dir)
    val allCells = store.select("cell").distinct().count()
    val touched = operators.DedupText
      .bandTable(operators.DedupText.packedHashTable(spark, sf).filter(oneDoc))
      .select(BandIndexStore.cellOf(col("band"), col("bkey")).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(touched.size <= graft.functions.HashFunctions.NumBands)
    assert(allCells > touched.size,
      s"store degenerated to $allCells cells; pruning unobservable")
    // and the files the pruned scan actually reads all live under touched
    // cell directories — the on-disk form of "unprobed files never open"
    val pruned = store.filter(col("cell").isin(touched.toSeq.map(Int.box): _*))
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty &&
      files.forall(fn => touched.exists(c => fn.contains(s"cell=$c/"))))
  }

  test("probe result for the one-doc batch matches a corpus-wide check") {
    // ground truth: brute-force verified pairs for doc 7 against all old
    // docs (tiny at sf0.001) — the probe must agree through the index
    val hashes = operators.DedupText.packedHashTable(spark, sf)
    val newSide = hashes.filter(col("doc_id") === 7)
      .select(col("doc_id").as("new_id"), col("hs").as("hsn"))
    val oldSide = hashes.filter(!(col("doc_id") % 10 === 7))
      .select(col("doc_id").as("old_id"), col("hs").as("hso"))
    val brute = newSide.crossJoin(oldSide)
      .select(col("new_id"), col("old_id"),
        round(size(array_intersect(col("hsn"), col("hso"))).cast("double") /
          size(array_union(col("hsn"), col("hso"))), 6).as("j"))
      .filter(col("j") >= 0.5)
      .orderBy(col("old_id")).collect()
    val got = BandIndexStore.probe(spark, sf, col("doc_id") === 7, dir)
      .head()
    if (brute.isEmpty) {
      assert(got.getLong(1) == -1L && got.getDouble(2) == 0.0)
    } else {
      // the banded probe may legitimately miss band-collision-free pairs;
      // but any pair it reports must be a true verified pair
      val bruteMap = brute.map(r => r.getLong(1) -> r.getDouble(2)).toMap
      if (got.getLong(1) != -1L)
        assert(bruteMap.get(got.getLong(1)).contains(got.getDouble(2)))
    }
  }
}
