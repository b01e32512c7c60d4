package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

class CanonicalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonicalize: chains and triangles collapse to min id; clusters stay separate") {
    // cluster {1,2,3} via chain 1-2, 2-3; cluster {10,11,12} via triangle;
    // cluster {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val labels = Dedup.canonicalize(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("canonicalize == union-find on random graphs (including long paths)") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30
      val edges = (1 to 25).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b } ++
        // a long path stresses the O(log diameter) propagation rounds
        (50L until 62L).map(i => (i, i + 1))
      val pairs = edges.toDF("id_a", "id_b")
      val got = Dedup.canonicalize(pairs, maxIter = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = members.map(m => m -> members.filter(o => find(o) == find(m)).min).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("canonicalize converges in O(log diameter) rounds (pointer jumping)") {
    // A 200-node path has diameter 199: pure 1-hop min-propagation needs
    // ~199 rounds, so converging within maxIter = 12 (2^12 ≫ 200 reach
    // with path halving) proves the jump step works.
    val pairs = (1000L until 1199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.canonicalize(pairs, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 200 && labels.values.forall(_ == 1000L))
  }

  test("canonicalize: the checkpointer is value-neutral (identity == " +
      "eager localCheckpoint)") {
    // label iterates are exact integer mins, so whether lineage is cut
    // every round (the production default) or never (identity) cannot
    // change a single label. A 5-node path needs ~3 rounds — enough to
    // exercise multi-round identity lineage while keeping the uncut
    // variant's plan bounded: each uncut round embeds the previous
    // round's tree THREE times (propagate/jump/union), so tree size is
    // 3^rounds and a longer path turns this test into a Catalyst
    // planning soak (r15: the previous 8-node path spent 52 s of the
    // suite in the analyzer alone).
    val pairs = (500L until 504L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    def labels(ck: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
      val m = Dedup.canonicalize(pairs, maxIter = 12, checkpointer = ck)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      CacheRegistry.unpersistAll()
      m
    }
    val viaDefault = labels(_.localCheckpoint())
    val viaIdentity = labels(identity)
    assert(viaDefault == viaIdentity)
    assert(viaDefault.size == 5 && viaDefault.values.forall(_ == 500L))
  }

  test("dropNearDuplicates keeps canonical members and untouched rows") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (9L, "z")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L))
  }
}
