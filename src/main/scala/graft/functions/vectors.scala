package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns using higher-order
  * built-ins (`zip_with` + `aggregate`) — stays inside Catalyst, no
  * UDF/serde round-trip per row.
  */
object vectors {

  /** Dot product of two equal-length float arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Sign bits against `planes` (a Seq of weight vectors) packed into a
    * long — random-hyperplane LSH signature. Planes are deterministic
    * (derived from a seeded generator at build time), so signatures are
    * reproducible across runs/executors.
    */
  def hyperplaneSig(vec: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val pCol = array(p.map(lit): _*)
      when(dot(vec, pCol) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
