package graft.ops

import graft.SparkSpecBase

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("chains, triangles, and singleton pairs get min-id labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(Seq(20L, 21L).forall(labels(_) == 20L))
  }

  test("random graphs match a driver-side union-find (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    for (trial <- 0 until 5) {
      val n = 40
      val gen = Gen.listOfN(60, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
      val raw = gen(Gen.Parameters.default, Seed(trial.toLong)).get
      val edges = raw.filter { case (a, b) => a != b }
      // driver-side union-find reference
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        .map { v =>
          // min id reachable = root after path compression by min
          def minRoot(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
          (v, minRoot(v.toInt).toLong)
        }.toMap
      val got = Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"), maxIters = 20)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"trial $trial diverged")
    }
  }

  test("empty pair list yields empty labeling (no NPE)") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(noPairs)
    assert(labels.columns.toSeq == Seq("id", "label"))
    assert(labels.count() == 0L)
  }

  test("long chain converges within iteration bound") {
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs, maxIters = 12)
      .as[(Long, Long)].collect()
    assert(labels.forall(_._2 == 0L))
  }
}
