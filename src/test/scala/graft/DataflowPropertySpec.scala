package graft

import org.apache.spark.sql.functions._

final case class PropRec(id: Int)

/** Property layer (SURVEY.md §5.3): dedup idempotence, union-dedup
  * commutativity, suffix-filter ingest invariant, error-isolation
  * counting — checked over seeded generated inputs (deterministic;
  * plain scalatest loops, no external property framework needed
  * offline).
  */
class DataflowPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def genPaths(): List[String] = {
    val pool = (1 to 30).map(i => s"/data/f$i.dwg") ++ Seq("/x/a.txt", "/x/b.TXT")
    List.fill(rnd.nextInt(40))(pool(rnd.nextInt(pool.size)))
  }

  test("dedup is idempotent: f(f(x)) == f(x)") {
    (1 to 10).foreach { _ =>
      val df = genPaths().toDF("path")
      val once = df.dropDuplicates("path")
      assert(once.count() == once.dropDuplicates("path").count())
    }
  }

  test("union-dedup is commutative on row sets") {
    (1 to 10).foreach { _ =>
      val a = genPaths(); val b = genPaths()
      val ab = a.toDF("path").union(b.toDF("path")).dropDuplicates("path")
        .collect().map(_.getString(0)).toSet
      val ba = b.toDF("path").union(a.toDF("path")).dropDuplicates("path")
        .collect().map(_.getString(0)).toSet
      assert(ab == ba)
    }
  }

  test("suffix filter + dedup = the reference ingest invariant (A4/A5)") {
    (1 to 10).foreach { _ =>
      val ps = genPaths()
      val got = ps.toDF("path")
        .filter(lower(col("path")).endsWith(".dwg"))
        .dropDuplicates("path").count()
      assert(got == ps.filter(_.toLowerCase.endsWith(".dwg")).toSet.size)
    }
  }

  test("pipeline error isolation: each record counted exactly once") {
    import graft.operators.Pipeline
    import graft.operators.Pipeline.Stage
    Seq((1, 0), (7, 2), (30, 3), (13, 1)).foreach { case (n, failEvery) =>
      val corpus = (1 to n).map(PropRec.apply).toDS()
      val st = Stage[PropRec]("s", 0, enabled = true, r =>
        if (failEvery > 0 && r.id % failEvery == 0)
          throw new RuntimeException("x")
        else r)
      val m = Pipeline.run(spark, corpus, Seq(st)).metrics
      assert(m.total == n && m.succeeded + m.failed == n)
      val expectFail = if (failEvery > 0) (1 to n).count(_ % failEvery == 0) else 0
      assert(m.failed == expectFail)
      assert(math.abs(m.successRatio - (n - expectFail).toDouble / n) < 1e-12)
    }
  }
}
