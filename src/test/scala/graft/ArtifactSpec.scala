package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.operators.{Artifacts, DedupOps, Relational, Release}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The build-once artifact cache must be (a) a cache — the builder runs
  * exactly once per key, even under concurrent first callers — and
  * (b) invisible to correctness: the stored tables the consume path
  * reads equal a fresh run of the raw derivation row-for-row, for both
  * published artifacts (co-purchase graph, duplicate-cluster labels). */
class ArtifactSpec extends SparkSpec {

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("dirFor builds exactly once per key and memoizes the directory") {
    val calls = new AtomicInteger(0)
    val build: String => Unit = { dir =>
      calls.incrementAndGet()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    }
    val d1 = Artifacts.dirFor("spec:once", build)
    val d2 = Artifacts.dirFor("spec:once", build)
    assert(d1 == d2 && calls.get() == 1)
    // distinct keys get distinct directories and their own build
    val d3 = Artifacts.dirFor("spec:other", build)
    assert(d3 != d1 && calls.get() == 2)
  }

  test("artifact builders compose: a build may call dirFor on another key") {
    // the LPA label build reads the co-purchase artifact — nested
    // dirFor used to throw IllegalStateException("Recursive update")
    // under the old computeIfAbsent locking whenever the dependent
    // artifact was the first builder on a fresh dataset
    val calls = new AtomicInteger(0)
    val outer = Artifacts.dirFor("spec:nested-outer", { dir =>
      val inner = Artifacts.dirFor("spec:nested-inner", { d2 =>
        calls.incrementAndGet()
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d2))
      })
      assert(new java.io.File(inner).isDirectory)
      calls.incrementAndGet()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    })
    assert(new java.io.File(outer).isDirectory && calls.get() == 2)
  }

  test("a throwing build deletes its partial output, so the retry's write cannot collide") {
    val calls = new AtomicInteger(0)
    intercept[RuntimeException] {
      Artifacts.dirFor("spec:partial", { dir =>
        calls.incrementAndGet()
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, "part"), "half-written")
        throw new RuntimeException("boom mid-write")
      })
    }
    val retried = Artifacts.dirFor("spec:partial", { dir =>
      calls.incrementAndGet()
      assert(!new java.io.File(dir, "part").exists(),
        "partial output survived the failed build")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    })
    assert(new java.io.File(retried).isDirectory && calls.get() == 2)
  }

  test("a throwing build leaves no mapping, so the next caller retries") {
    val calls = new AtomicInteger(0)
    intercept[RuntimeException] {
      Artifacts.dirFor("spec:fails", { _ =>
        calls.incrementAndGet(); throw new RuntimeException("boom")
      })
    }
    Artifacts.dirFor("spec:fails", { dir =>
      calls.incrementAndGet()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    })
    assert(calls.get() == 2)
  }

  test("co-purchase artifact: consume path equals the raw build path") {
    val (e, deg) = Release.copurchaseGraph(spark, sf)
    val (eRaw, degRaw) = Release.copurchaseGraphRaw(spark, sf)
    assert(e.count() > 0)
    assert(same(e, eRaw), "edges artifact diverged from the raw derivation")
    assert(same(deg, degRaw), "degree artifact diverged from the raw derivation")
  }

  test("directed co-purchase artifact: nbw/ws equal the raw derivation") {
    val (nbw, ws) = Release.copurchaseDirected(spark, sf)
    val (eRaw, _) = Release.copurchaseGraphRaw(spark, sf)
    val nbRaw = eRaw.select(col("p1").as("u"), col("p2").as("v"), col("w"))
      .unionAll(eRaw.select(col("p2").as("u"), col("p1").as("v"), col("w")))
    val wsRaw = nbRaw.groupBy("u").agg(sum("w").as("s"))
    assert(ws.count() > 0)
    assert(same(ws, wsRaw), "out-weight artifact diverged from raw derivation")
    assert(same(nbw, nbRaw.join(wsRaw, "u").withColumn("fm",
        expr("CAST(CAST(w AS DECIMAL(38,0)) * 1073741824 div s AS BIGINT)"))),
      "directed adjacency artifact diverged from raw derivation")
    // the fixed-point factor law: fm ≤ 2³⁰ everywhere (w ≤ s), so the
    // q_ppr round term r·fm stays inside a primitive long
    assert(nbw.where(col("fm") > 1073741824L || col("fm") < 0).count() == 0,
      "fm out of [0, 2^30] — the long-arithmetic bound argument breaks")
  }

  test("cc-labels artifact: consume path equals a fresh star-contraction run") {
    val labels = Release.copurchaseCcLabels(spark, sf, 3L)
    val (eRaw, _) = Release.copurchaseGraphRaw(spark, sf)
    val fresh = DedupOps.connectedComponentsStar(
      eRaw.where(col("w") >= 3)
        .select(col("p1").as("id1"), col("p2").as("id2")))
    assert(labels.count() > 0)
    assert(same(labels, fresh),
      "cc-labels artifact diverged from a fresh star-contraction run")
  }

  test("lpa-labels artifact: consume path equals a fresh 4-round LPA run") {
    val labels = Release.lpaLabels(spark, sf)
    val fresh = Release.lpaLabelsRaw(spark, sf)
    assert(labels.count() > 0)
    assert(same(labels, fresh),
      "lpa-labels artifact diverged from a fresh 4-round LPA run")
  }

  test("dup-cluster artifact: consume path equals the raw build path") {
    val (corpus, clusters) = DedupOps.corpusAndClusters(spark, sf)
    val (corpusRaw, clustersRaw) = DedupOps.corpusAndClustersRaw(spark, sf)
    assert(clusters.count() > 0)
    assert(same(corpus, corpusRaw))
    assert(same(clusters, clustersRaw),
      "cluster-label artifact diverged from the raw derivation")
  }

  test("capped-adjacency artifact: stored top-256 table equals a fresh rank-window build") {
    val stored = Release.cappedAdjacency(spark, sf)
    val fresh = Release.cappedAdjacencyRaw(spark, sf)
    assert(stored.count() > 0)
    assert(same(stored, fresh),
      "capped adjacency artifact diverged from a fresh build")
  }

  test("co-purchase hubs artifact: stored top-1% set equals a fresh ranked build") {
    val stored = Release.copurchaseHubs(spark, sf)
    val fresh = Release.copurchaseHubsRaw(spark, sf)
    assert(stored.count() > 0)
    assert(same(stored, fresh),
      "hub-set artifact diverged from a fresh GlobalOrder ranked build")
  }

  test("nb-scores artifact: stored score frame equals a fresh train+score run") {
    val stored = graft.operators.Curation.nbScores(spark, sf)
    val fresh = graft.operators.Curation.nbScoresRaw(spark, sf)
    assert(stored.count() > 0)
    assert(same(stored, fresh),
      "nb-scores artifact diverged from a fresh train+score run")
  }

  test("incremental base-index artifact: stored index equals a fresh LSH build") {
    val stored = DedupOps.incrementalBaseIndex(spark, sf)
    val fresh = DedupOps.incrementalBaseIndexRaw(spark, sf)
    assert(stored.count() > 0)
    assert(same(stored, fresh),
      "stored base LSH index diverged from a fresh build")
  }

  test("abc running-total artifact: stored frame equals a fresh GlobalOrder build") {
    val stored = Relational.abcRunningTotal(spark, sf)
    val fresh = Relational.abcRunningTotalRaw(spark, sf)
    assert(stored.count() > 0)
    assert(same(stored, fresh),
      "abc running-total artifact diverged from a fresh build")
    graft.operators.GlobalOrder.release()
  }
}
