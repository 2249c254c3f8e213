package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = und.map(_._1).toSeq.sorted
    val tris = for {
      x <- nodes; y <- nodes if y > x; z <- nodes if z > y
      if und((x, y)) && und((y, z)) && und((x, z))
    } yield Seq(x, y, z)
    tris.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  private def viaSpark(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("counts the K4 graph: every node in 3 triangles") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(viaSpark(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("direction and duplicate edges are ignored; no false triangles on a path") {
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
    assert(viaSpark(path).isEmpty)
  }

  test("property: matches brute force on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 15) {
      val edges = List.fill(14)((rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
      assert(viaSpark(edges) == brute(edges), s"trial $trial $edges")
    }
  }
}
