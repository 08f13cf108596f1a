package graft

import org.apache.spark.sql.functions._

import graft.operators.StorageQueries

/** Pins the storage-gate invariants the DuckDB hash compare can't
  * articulate on its own: WHICH file wins the cross-file dedup, that
  * conflicting COPY values never overwrite stored rows, and that the
  * encrypted round trip is lossless (st01–st04 run the full gate paths
  * here at sf0.001, so a green suite also proves the gates execute
  * without the driver). */
class StorageGateSpec extends SparkTestBase {

  test("st01: cross-file dup keeps the f0 copy, every nation lands once") {
    val out = StorageQueries.st01MultifileUnion(spark, sfDir).collect()
    assert(out.length === 25)
    assert(out.map(_.getString(0)).distinct.length === 25)
    val dup = out.find(_.getString(0) == "NATION_0").get
    assert(dup.getString(3) === "f0") // deterministic keep: file_id ordered last
    // parity split preserved for non-duplicated keys
    assert(out.filter(_.getString(3) == "f1").forall(r => r.getLong(1) % 2 == 1))
  }

  test("st02: ignore-errors COPY drops every existing key, appends only new") {
    val out = StorageQueries.st02CopyIgnoreErrors(spark, sfDir)
    assert(out.count() === 27)
    // the batch tried to remap region-0 nations to 99: stored values win
    assert(out.filter(col("regionkey") === 99 &&
      !col("identifier").startsWith("NEWLAND_")).count() === 0)
    assert(out.filter(col("file_id") === "batch2").count() === 2)
  }

  test("st03: SQL passthrough reads the ingested state through views") {
    val out = StorageQueries.st03SqlPassthrough(spark, sfDir).collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(1)).sum === 25) // all nations accounted for
  }

  test("st04: encrypted backup/restore round trip is lossless") {
    val out = StorageQueries.st04BackupRestore(spark, sfDir).collect()
    assert(out.length === 25)
    assert(out.map(_.getString(0)).distinct.length === 25)
    assert(out.forall(r => r.getString(2) != null))
  }

  test("st05: generated xlsx stages and ingests every nation row typed") {
    val out = StorageQueries.st05XlsxStaging(spark, sfDir).collect()
    assert(out.length === 25)
    assert(out.forall(_.getString(3) == "upload1"))
    // numeric cells came through typed, not as strings
    assert(out.map(_.getLong(1)).sum === (0 until 25).sum)
  }

  test("st07: generated legacy .xls stages and ingests every nation row typed") {
    val out = StorageQueries.st07XlsStaging(spark, sfDir).collect()
    assert(out.length === 25)
    assert(out.forall(_.getString(3) == "upload2"))
    assert(out.map(_.getLong(1)).sum === (0 until 25).sum)
  }

  test("st06: ndjson chunks re-parse to the exact aggregate") {
    val out = StorageQueries.st06NdjsonRoundtrip(spark, sfDir).collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(1)).sum === 25)
  }

  test("t42: exact jaccard gate matches the LSH-verified t05 pair set on sf0.001") {
    // recall-1 inverted index must find at least every pair the banded
    // LSH path (verified at the same threshold) found
    val exact = graft.operators.PipelineQueries.t42JaccardExact(spark, sfDir)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.operators.PipelineQueries.t05MinhashPairs(spark, sfDir)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }
}
