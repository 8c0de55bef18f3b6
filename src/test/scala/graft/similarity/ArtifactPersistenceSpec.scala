package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-trip contracts for the trained-artifact persistence layer: a
  * production ANN stack fits once offline and serves every subsequent job
  * from saved artifacts, so fit → save → load must be an IDENTITY on
  * every downstream result — encodes, assignments, and searches from the
  * loaded artifact hash-match the in-session fit exactly (parquet
  * round-trips doubles bit-for-bit; no tolerance comparisons here).
  */
class ArtifactPersistenceSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  private def h(i: Long, s: Int): Double =
    (((i * 2654435761L + s * 40503L) % 1000) / 1000.0) - 0.5

  private lazy val corpus =
    (0L until 200L).map { i =>
      (i, (0 until dim).map(j => h(i, j + 1) * 3 + (i % 5).toDouble))
    }.toDF("vec_id", "embedding")

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("PQ codebook round-trips: loaded encode and ADC search are identical") {
    val pq = new ProductQuantizer(numSubspaces = 2, codebookSize = 8, dim = dim)
    val cb = pq.fit(corpus).localCheckpoint()
    val path = tmp("pq")
    ProductQuantizer.saveCodebook(cb, path)
    val loaded = ProductQuantizer.loadCodebook(spark, path)

    assert(rows(loaded) === rows(cb))
    assert(rows(pq.encode(corpus, loaded)) === rows(pq.encode(corpus, cb)))

    val queries = corpus.where(col("vec_id") < 3)
    assert(rows(pq.adcSearch(queries, pq.encode(corpus, loaded), loaded, k = 4))
      === rows(pq.adcSearch(queries, pq.encode(corpus, cb), cb, k = 4)))
  }

  test("forCodebook recovers quantizer params from the artifact alone") {
    val pq = new ProductQuantizer(numSubspaces = 2, codebookSize = 8, dim = dim)
    val path = tmp("pq-params")
    ProductQuantizer.saveCodebook(pq.fit(corpus), path)
    val loaded = ProductQuantizer.loadCodebook(spark, path)
    val served = ProductQuantizer.forCodebook(loaded)
    // the reconstructed quantizer slices/encodes exactly like the original
    assert(rows(served.encode(corpus, loaded)) === rows(pq.encode(corpus, loaded)))
  }

  test("forCodebook fails loudly on an empty codebook artifact") {
    val path = tmp("pq-empty")
    val pq = new ProductQuantizer(numSubspaces = 2, codebookSize = 8, dim = dim)
    ProductQuantizer.saveCodebook(pq.fit(corpus).limit(0), path)
    val e = intercept[IllegalArgumentException] {
      ProductQuantizer.forCodebook(ProductQuantizer.loadCodebook(spark, path))
    }
    assert(e.getMessage.contains("empty codebook"))
  }

  test("KMeans centroids round-trip: loaded assignment and summary are identical") {
    val km = new KMeans(k = 4, iters = 2, dim = dim)
    val cents = km.fit(corpus)
    val path = tmp("km")
    KMeans.saveCentroids(cents, path)
    val loaded = KMeans.loadCentroids(spark, path)

    assert(rows(loaded) === rows(cents))
    assert(rows(km.assign(corpus, loaded)) === rows(km.assign(corpus, cents)))
    assert(rows(km.summary(corpus, loaded)) === rows(km.summary(corpus, cents)))
  }

  test("saved KMeans centroids drive IvfCosineIndex.buildWith across the load") {
    val km = new KMeans(k = 4, iters = 2, dim = dim)
    val path = tmp("km-ivf")
    KMeans.saveCentroids(km.fit(corpus), path)
    val ivf = new IvfCosineIndex(numCentroids = 4, nprobe = 2, dim = Some(dim))
    val idx = ivf.buildWith(corpus, KMeans.loadCentroids(spark, path))
    val direct = ivf.buildWith(corpus, km.fit(corpus))
    val queries = corpus.where(col("vec_id") < 3)
    assert(rows(ivf.search(queries, idx, k = 3)) === rows(ivf.search(queries, direct, k = 3)))
  }

  test("IVF index maintenance cycle: load -> append new batch -> re-save -> search") {
    val ivf = new IvfCosineIndex(numCentroids = 4, nprobe = 2, dim = Some(dim))
    val old = corpus.where(col("vec_id") < 150)
    val batch = corpus.where(col("vec_id") >= 150)
    val path = tmp("ivf-cycle")

    // nightly cycle: reopen yesterday's index, append today's batch with
    // one broadcast-centroid pass (no rescan of the indexed corpus), save
    // to the NEXT version directory — the appended frame lazily reads
    // yesterday's layout, so saving over it in place would overwrite the
    // write's own source (Spark rejects it); versioned paths are the
    // production pattern anyway (atomic cutover, rollback)
    ivf.build(old).save(s"$path/v1")
    val appended = ivf.append(IvfIndex.load(spark, s"$path/v1"), batch)
    appended.save(s"$path/v2")

    // the re-saved layout must serve searches identical to the in-session
    // appended index
    val reopened = IvfIndex.load(spark, s"$path/v2")
    val queries = corpus.where(col("vec_id") < 3)
    assert(rows(ivf.search(queries, reopened, k = 3))
      === rows(ivf.search(queries, appended, k = 3)))
    assert(reopened.lists.count() === 200L)
  }

  test("empty IVF index save leaves a loadable (schema-bearing) layout") {
    val ivf = new IvfCosineIndex(numCentroids = 4, nprobe = 2, dim = Some(dim))
    val idx = ivf.build(corpus.limit(0))
    val path = tmp("ivf-empty")
    idx.save(path)
    // load must not die with UNABLE_TO_INFER_SCHEMA: the degenerate write
    // falls back to a schema-only unpartitioned file
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.lists.columns.contains("cid"))
    assert(loaded.lists.count() === 0L)
  }

  test("OPQ model round-trips: rotation matrix exact, rotated encode identical") {
    val opq = new OpqRotation(numSubspaces = 2, codebookSize = 8, dim = dim,
      iters = 2, lloydSteps = 1)
    val model = opq.fit(corpus)
    val path = tmp("opq")
    model.save(path)
    val loaded = OpqRotation.load(spark, path)

    assert(loaded.rotation.length === dim)
    assert(loaded.rotation.map(_.toSeq).toSeq === model.rotation.map(_.toSeq).toSeq)
    assert(rows(loaded.codebook) === rows(model.codebook))

    // end-to-end serving identity: rotate + encode from the loaded model
    val pq = ProductQuantizer.forCodebook(loaded.codebook)
    assert(rows(pq.encode(opq.rotate(corpus, loaded.rotation), loaded.codebook))
      === rows(pq.encode(opq.rotate(corpus, model.rotation), model.codebook)))
  }
}
