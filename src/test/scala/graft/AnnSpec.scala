package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the non-oracle similarity / fingerprint / langid operators. */
class AnnSpec extends AnyFunSuite {
  import SparkFixture._

  test("sim_ann_ivf returns 5 ranked neighbors per query from one bucket") {
    val out = SparkEntry.queries("sim_ann_ivf")(spark, sf)
    val rows = out.collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    for ((q, rs) <- byQ) {
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length), s"q=$q")
      val cosines = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cosines.sameElements(cosines.sorted.reverse), s"not descending for q=$q")
    }
  }

  test("sim_ann_ivf recall vs brute force is sane (>= 20% at nprobe=1, 8 buckets)") {
    val ivf = SparkEntry.queries("sim_ann_ivf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    // brute-force top-5 for the same queries
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val q = emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("e").as("q_e"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(desc("cos"), col("vec_id"))
    val brute = q.crossJoin(emb).filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(aggregate(zip_with(col("q_e"), col("e"), (x, y) => x * y),
        lit(0.0), (a, v) => a + v), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall=$recall (ivf=${ivf.size}, brute=${brute.size})")
  }

  test("sim_ann_kmeans returns ranked neighbors and beats nprobe=1 recall floor") {
    val out = SparkEntry.queries("sim_ann_kmeans")(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    for ((q, rs) <- byQ) {
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length), s"q=$q")
    }
    val kmeans = out.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val q = emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("e").as("q_e"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(desc("cos"), col("vec_id"))
    val brute = q.crossJoin(emb).filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(graft.functions.DotProduct.dot(col("q_e"), col("e")), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = kmeans.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall=$recall (kmeans=${kmeans.size}, brute=${brute.size})")
  }

  test("simhash signatures collide for identical texts") {
    import spark.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_simhash_test"
    Seq(
      (1L, "spark query join sort batch stream window"),
      (2L, "spark query join sort batch stream window"),
      (3L, "alpha beta gamma delta epsilon zeta eta")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = SparkEntry.queries("dedup_simhash")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"identical texts must collide: $pairs")
    assert(!pairs.exists(p => p._2 == 3L), s"distinct doc collided: $pairs")
  }

  test("simhash pairs near-duplicates within the Hamming ball, not only exact") {
    import spark.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_simhash_near_test"
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, base),                          // 40 shared tokens
      (2L, base + " extraword"),           // one token added -> few sign flips
      (3L, (1 to 40).map(i => s"other$i").mkString(" ")) // disjoint vocab
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("dedup_simhash")(spark, tmp).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-dup (1 token off) must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"disjoint doc paired: $pairs")
    val hamming = rows.collectFirst {
      case r if (r.getLong(0), r.getLong(1)) == (1L, 2L) => r.getAs[Int]("hamming")
    }.get
    assert(hamming >= 0 && hamming <= 2, s"hamming=$hamming out of declared ball")
  }

  test("langid picks the language whose markers dominate crafted text") {
    import spark.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_langid_test"
    Seq(
      (1L, "x", "the then there another thing"), // en markers: th he in er an
      (2L, "x", "schnell schweigen reichen eichen") // de markers: sch ch ei en er
    ).toDF("doc_id", "lang", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val preds = SparkEntry.queries("text_langid")(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(preds(1L) == "en", s"got $preds")
    assert(preds(2L) == "de", s"got $preds")
  }

  test("langid is discriminative on the real corpus: continuous, non-tied scores") {
    // The synthetic corpus draws every lang's text from ONE shared
    // English-ish vocabulary (token shares ≈ the 43% base rate for every
    // token — label is independent of text), so majority-class accuracy
    // is the information-theoretic ceiling. What the scorer must NOT do
    // is tie: scores must vary with each document's character statistics.
    val out = graft.api.TextOps.langId(
      graft.Tables.documents(spark, sf), "doc_id", "text").collect()
    val scores = out.map(_.getAs[Double]("pred_score")).distinct
    assert(scores.length > out.length / 4,
      s"scores collapse to ${scores.length} distinct values over ${out.length} docs")
    val joined = SparkEntry.queries("text_langid")(spark, sf).collect()
    val acc = joined.count(r => r.getAs[String]("pred_lang") == r.getAs[String]("true_lang"))
      .toDouble / joined.length
    val majority = joined.groupBy(_.getAs[String]("true_lang")).values.map(_.size).max
      .toDouble / joined.length
    assert(acc >= majority * 0.8,
      s"accuracy $acc far below the majority-class ceiling $majority on label-random text")
  }

  test("emb_neardup_lsh is a verified subset of exact pairs with usable recall") {
    def pairs(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = pairs("emb_neardup")
    val lsh = pairs("emb_neardup_lsh")
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh.diff(exact).take(5)}")
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.5,
      s"recall ${lsh.size}/${exact.size} below 0.5")
  }

  test("64-bit simhash pairs identical texts and is a subset of the 32-bit pairs") {
    import spark.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_simhash64_test"
    Seq(
      (1L, "spark query join sort batch stream window"),
      (2L, "spark query join sort batch stream window"),
      (3L, "alpha beta gamma delta epsilon zeta eta")
    ).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val p64 = SparkEntry.queries("dedup_simhash64")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p64.contains((1L, 2L)), s"identical texts must collide at 64 bits: $p64")
    assert(!p64.exists(p => p._2 == 3L), s"distinct doc collided: $p64")
    // bits 0-31 of the 64-bit signature ARE the 32-bit signature, so
    // hamming64 >= hamming32 and (with full band recall <= 3 bits on
    // both) the 64-bit pair set refines the 32-bit one
    def pairs(name: String) = SparkEntry.queries(name)(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs("dedup_simhash64").subsetOf(pairs("dedup_simhash")))
  }

  test("dedup_components_lsh clusters refine exact components and exact duplicates always cluster") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    // ground truth: exact token-Jaccard >= 4/5 pairs -> min-label CC
    val exact = graft.api.DedupOps.connectedComponents(
        graft.api.DedupOps.nearJaccardPairs(docs, "doc_id", "text")
          .select(col("id_a"), col("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = SparkEntry.queries("dedup_components_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // refinement: two docs the LSH path clusters together must belong to
    // the same exact component (LSH pairs are a verified subset)
    lsh.groupBy(_._2).values.foreach { grp =>
      val exactComps = grp.map(d => exact(d._1)).distinct
      assert(exactComps.size === 1,
        s"LSH cluster spans exact components: $grp -> $exactComps")
    }
    // full recall on EXACT duplicates (identical text => identical
    // minhash signature => same buckets): every exact-dup group from
    // dedup_exact with >1 member must appear clustered
    val dupGroups = docs.groupBy(col("text"))
      .agg(org.apache.spark.sql.functions.collect_list(col("doc_id")).as("ids"))
      .filter(org.apache.spark.sql.functions.size(col("ids")) > 1)
      .collect().map(_.getSeq[Long](1))
    val lshComp = lsh.toMap
    dupGroups.foreach { ids =>
      val comps = ids.map(lshComp.get).distinct
      assert(comps.size === 1 && comps.head.nonEmpty,
        s"exact duplicates $ids not clustered: $comps")
    }
  }

  test("emb_neardup pairs all have cos >= 0.45 and appear in both directions-free form") {
    val rows = SparkEntry.queries("emb_neardup")(spark, sf).collect()
    assert(rows.forall(_.getAs[Double]("cos") >= 0.45))
    assert(rows.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
  }

  test("multimodal metadata is consistent with payload bytes") {
    val out = SparkEntry.queries("mm_binary_meta")(spark, sf)
    assert(out.filter(col("meta_consistent") === false).count() === 0)
  }
}
