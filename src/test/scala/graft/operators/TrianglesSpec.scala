package graft.operators

import graft.SparkTestBase

/** Degree-oriented triangle counting vs the O(n³) definitional brute
  * force on structured and random graphs, plus the edge-set purity
  * claim (order/duplicate/direction independence) — [[BfsSpec]]'s
  * discipline for the graph family's distributed faces.
  */
class TrianglesSpec extends SparkTestBase {
  import TrianglesSpec.brute

  private def run(edges: Seq[(String, String)])
      : Map[String, (Long, Long)] = {
    import spark.implicits._
    Triangles.perNode(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("single triangle: every node has deg 2, tri 1") {
    assert(run(Seq(("a", "b"), ("b", "c"), ("c", "a"))) ==
      Map("a" -> (2L, 1L), "b" -> (2L, 1L), "c" -> (2L, 1L)))
  }

  test("square has no triangles; the diagonal creates two") {
    val square = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    assert(run(square).values.forall(_._2 == 0L))
    val withDiag = run(square :+ ("a", "c"))
    // diagonal endpoints sit in both triangles, the others in one
    assert(withDiag == Map("a" -> (3L, 2L), "c" -> (3L, 2L),
      "b" -> (2L, 1L), "d" -> (2L, 1L)))
  }

  test("K5: each node in C(4,2)=6 triangles; star and chain in none") {
    val k5 = for {
      i <- 0 until 5; j <- (i + 1) until 5
    } yield (s"k$i", s"k$j")
    assert(run(k5).values.toSet == Set((4L, 6L)))
    val star = (1 to 6).map(i => ("hub", s"s$i"))
    assert(run(star).values.forall(_._2 == 0L))
    val chain = (0 until 5).map(i => (s"c$i", s"c${i + 1}"))
    assert(run(chain).values.forall(_._2 == 0L))
  }

  // deterministic LCG random digraph (BfsSpec's generator shape):
  // dense enough that triangles, shared edges, and hubs all occur
  private def messyGraph(nodes: Int, mult: Int): Seq[(String, String)] = {
    var seed = 0x517CC1B727220A95L
    def next(mod: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % mod).toInt + mod) % mod
    }
    (0 until nodes).flatMap { i =>
      (0 until 1 + next(mult)).map(_ => (s"n$i", s"n${next(nodes)}"))
    }
  }

  test("random graphs match the definitional brute force exactly") {
    for (edges <- Seq(messyGraph(20, 6), messyGraph(40, 4))) {
      val got = run(edges)
      val exp = brute(edges)
      assert(got == exp,
        s"mismatch: only-got=${got.toSet -- exp.toSet} " +
          s"only-exp=${exp.toSet -- got.toSet}")
    }
  }

  test("counts are a pure function of the edge set") {
    val edges = messyGraph(25, 5)
    val messy = scala.util.Random.shuffle(
      edges ++ edges.map(_.swap) ++ edges.take(10) ++
        Seq(("n1", "n1"), ("n3", "n3")))
    assert(run(edges) == run(messy))
  }
}

/** The definitional O(n³) per-node wedge-closure brute force — ONE
  * copy, shared by [[TrianglesSpec]] and the q213 reconciliation test
  * (two drifting copies of the same definitional algorithm was an r8
  * review finding).
  */
object TrianglesSpec {
  def brute(edges: Seq[(String, String)])
      : Map[String, (Long, Long)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct.toSet
    val nodes = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = nodes.map { n =>
      n -> und.collect {
        case (`n`, m) => m
        case (m, `n`) => m
      }
    }.toMap
    nodes.map { n =>
      val nb = adj(n).toSeq.sorted
      val tri = (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if und.contains(
          if (nb(i) < nb(j)) (nb(i), nb(j)) else (nb(j), nb(i)))
      } yield 1).size
      n -> (adj(n).size.toLong, tri.toLong)
    }.toMap
  }
}
