package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{DedupOps, SimilarityOps}

/** Large-star/small-star connected components: equality with min-label
  * propagation and an independent union-find, O(log n) round count on a
  * path graph (where min-label needs diameter rounds), empty-input
  * safety, plus the kmeans early-stop and keepList contracts.
  */
class LogStarSpec extends AnyFunSuite {
  import SparkFixture._

  private def pairsDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("id_a", "id_b")
  }

  /** Independent ground truth: plain union-find over the same edges. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // min-id per component as the canonical label
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap { ns => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("log-star equals min-label and union-find on random graphs") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 60).map { _ =>
        val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val df = pairsDf(edges)
      val expected = unionFind(edges)
      assert(toMap(DedupOps.connectedComponentsLogStar(df)) === expected, s"seed=$seed log-star")
      assert(toMap(DedupOps.connectedComponents(df)) === expected, s"seed=$seed min-label")
    }
  }

  test("path graph: log-star converges in O(log n) rounds where min-label needs diameter") {
    val path = (0L until 199L).map(i => (i, i + 1))
    val (labels, rounds) = DedupOps.logStarWithRounds(pairsDf(path))
    val m = toMap(labels)
    assert(m.size === 200)
    assert(m.values.forall(_ == 0L), "every path node joins component 0")
    assert(rounds <= 10, s"log-star must collapse a 200-node path in O(log n) rounds, took $rounds")
    // min-label propagates one hop per round — diameter 199 cannot fit
    // in 5 rounds and must fail loudly rather than return partial labels
    assertThrows[IllegalStateException] {
      DedupOps.connectedComponents(pairsDf(path), maxIters = 5).collect()
    }
  }

  test("both component algorithms return empty on a pair-free corpus (no NPE)") {
    val empty = pairsDf(Seq.empty)
    assert(DedupOps.connectedComponents(empty).count() === 0L)
    assert(DedupOps.connectedComponentsLogStar(empty).count() === 0L)
  }

  test("kmeans early-stops when centroids converge") {
    import spark.implicits._
    // two orthogonal clusters, interleaved ids so the init (two lowest-id
    // vectors) lands one centroid on each cluster: Lloyd's first pass
    // reproduces the centroids exactly, so with iters=20 the loop must
    // exit after the first confirming iteration
    val emb = (0L to 9L).map(i =>
      (i, if (i % 2 == 0) Array(1.0, 0.0) else Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val (centroids, itersRun) =
      SimilarityOps.kmeansWithIters(emb, "vec_id", "embedding", k = 2, iters = 20)
    assert(itersRun <= 2, s"early-stop must fire well before 20 iterations, ran $itersRun")
    assert(centroids.length === 2)
    centroids.foreach { case (_, v) =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("keepList keeps component anchors and never-paired docs") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // components: {1,2,3} anchored at 1, {4,5} anchored at 4; 6 unpaired
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "component_id")
    val kept = DedupOps.keepList(docs, comps, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 6L))
  }
}
