package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index-lifecycle soak at replicated scale (r15 order #6): the
  * production steady state — build → N appends → takedown deletes →
  * compact → versioned rebuild — run as ONE tree at `mult`× the sf0.1
  * embeddings mass, with a search after every step (the "under load"
  * arm: every reader-visible intermediate state is actually read) and
  * wall/heap printed per step. The per-step correctness of each
  * transition is spec- and driver-pinned at fixture scale (q132/q138/
  * q141/q144/q156); this probe answers the remaining question — does
  * the COMPOSITION hold its shape when the tree carries >sf0.1 mass.
  *
  *   sbt "runMain graft.LifecycleProbe 16"
  */
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{AnnIndex, Similarity}
    import spark.implicits._

    val dir = "/root/testdata/sf0.1"
    val emb1 = graft.engine.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val embN = emb1
      .crossJoin(spark.range(mult).toDF("rep"))
      .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"),
        concat(slice(col("embedding"), (col("rep") % 8 + 1).cast("int"), lit(64)),
          slice(col("embedding"), lit(1), (col("rep") % 8).cast("int")))
          .as("embedding"))
      .repartition(32)
      .persist()
    val n = embN.count()
    val nCells = Similarity.adaptiveCellCount(n)
    println(s"[lifecycle] corpus=${n} vecs (${mult}x sf0.1), nCells=$nCells")

    def mb(): Long = {
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
    }
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[lifecycle] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(heap ${mb()} MB)")
      out
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft_lifecycle").toString
    val idx = s"$root/idx"
    val q = emb1.where(col("vec_id") < 50)
    def searchCount(tag: String): Unit = {
      val c = t(s"search after $tag (k=5, nProbe=${math.max(2, nCells / 8)})") {
        AnnIndex.searchIvfIndexManyQueries(spark, idx, q,
          "vec_id", "embedding", k = 5,
          nProbe = math.max(2, nCells / 8)).count()
      }
      require(c == 250L, s"search after $tag returned $c rows, want 250")
    }

    // base build: 75% of the corpus
    val base = embN.where(col("vec_id") % 4 =!= 0)
    val delta = embN.where(col("vec_id") % 4 === 0)
    val cents = t(s"build (75% = ${n * 3 / 4} vecs)") {
      AnnIndex.buildIvfIndex(base, "vec_id", "embedding", idx,
        nCells = nCells, iters = 2, corpusRowsHint = Some(n * 3 / 4))
    }
    searchCount("build")
    // three appends (the drift)
    for (g <- 1 to 3) {
      t(s"append gen=$g (~${n / 12} vecs)") {
        AnnIndex.appendToIvfIndex(spark, idx,
          delta.where(col("vec_id") % 3 === (g - 1).toLong),
          "vec_id", "embedding", gen = g.toLong)
      }
      searchCount(s"append$g")
    }
    // two takedown batches (~20% of the corpus total)
    for (d <- 1 to 2) {
      t(s"delete del=$d (~${n / 10} ids)") {
        AnnIndex.deleteFromIvfIndex(spark, idx,
          embN.where(col("vec_id") % 10 === (d + 3).toLong)
            .select("vec_id"),
          "vec_id", del = d.toLong)
      }
      searchCount(s"delete$d")
    }
    t("compact (fold 4 gens + purge tombstones)") {
      AnnIndex.compactIvfIndex(spark, idx)
    }
    searchCount("compact")
    // recall sanity on the compacted tree vs the exact survivor set —
    // the IvfLifecycleFrozenRecallFloor shape re-measured at mult× mass
    val survivors = embN.where(
      col("vec_id") % 10 =!= 4L && col("vec_id") % 10 =!= 5L)
    val exact = Similarity.bruteForceTopK(q, survivors,
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = AnnIndex.searchIvfIndexManyQueries(spark, idx, q,
        "vec_id", "embedding", k = 5, nProbe = math.max(2, nCells / 2))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rs = exact.map { case (qid, ex) =>
      (got.getOrElse(qid, Set.empty) & ex).size.toDouble / ex.size }
    println(f"[lifecycle] compacted half-probe mean recall@5 vs exact " +
      f"survivors: ${rs.sum / rs.size}%.3f")
    // versioned zero-downtime rebuild over the survivors, then vacuum
    val vroot = s"$root/versioned"
    val (v1, _) = t("versioned rebuild v=1 (survivors, fresh centroids)") {
      AnnIndex.rebuildIvfIndexVersioned(survivors, "vec_id", "embedding",
        vroot, nCells = nCells, iters = 2,
        corpusRowsHint = Some(n * 8 / 10))
    }
    val (v2, _) = t("versioned rebuild v=2 (same corpus — the swap)") {
      AnnIndex.rebuildIvfIndexVersioned(survivors, "vec_id", "embedding",
        vroot, nCells = nCells, iters = 1,
        corpusRowsHint = Some(n * 8 / 10))
    }
    val cur = AnnIndex.currentIndexDir(spark, vroot)
    val c2 = t("search versioned current") {
      AnnIndex.searchIvfIndexManyQueries(spark, cur, q,
        "vec_id", "embedding", k = 5, nProbe = math.max(2, nCells / 8))
        .count()
    }
    require(c2 == 250L, s"versioned search returned $c2 rows")
    val vacuumed = t("vacuum keep=2 (retention grace for the reader)") {
      graft.ops.Versioning.vacuum(spark, vroot, keep = 2)
    }
    println(s"[lifecycle] versions: v1=$v1 v2=$v2 vacuumed=" +
      s"${vacuumed.mkString(",")} (keep=2 retains both — grace rule)")
    // two-level build at the same mass — the capacity path's datum
    t(s"two-level build (full corpus, ${nCells}x16 eff cells)") {
      AnnIndex.buildIvfIndexTwoLevel(embN, "vec_id", "embedding",
        s"$root/two", nCoarse = nCells, nFinePerCell = 16, iters = 2,
        corpusRowsHint = Some(n))
    }
    val c3 = t("two-level search (nPC=2, nPF=4)") {
      AnnIndex.searchIvfIndexTwoLevel(spark, s"$root/two", q,
        "vec_id", "embedding", k = 5, nProbeCoarse = 2, nProbeFine = 4)
        .count()
    }
    println(s"[lifecycle] two-level search rows=$c3")
    embN.unpersist()
    spark.stop()
  }
}
