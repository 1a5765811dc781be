package graft.fixtures

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VectorMath
import graft.similarity.Knn

/** [[ManifoldCorpus]] — the low-intrinsic-dimension measurement fixture.
  * Pins (1) determinism, (2) the cosine-contrast property that separates
  * it from the quasi-uniform [[Fp16Corpus]] (navigation gradient exists),
  * and (3) the fixture-shape claim itself in executable form: the SAME
  * beam walk over the SAME kNN-graph construction recovers true
  * neighbors on manifold data and fails on uniform data — the r13
  * serving-ladder finding (SCALE.md §r13) as a spec instead of a prose
  * argument. */
class ManifoldCorpusSpec extends SparkTestBase {

  test("vector is deterministic and fp16 round-trips through prepared") {
    val a = ManifoldCorpus.vector(42L)
    val b = ManifoldCorpus.vector(42L)
    assert(a.toSeq == b.toSeq)
    assert(a.length == ManifoldCorpus.Dim)
    // components stay in fp16's comfortable range (|x| small, no overflow)
    assert(a.forall(x => math.abs(x) < 8f))
  }

  test("pairwise cosine has navigation contrast; uniform fixture does not") {
    def cosSpread(vec: Long => Array[Float]): Double = {
      val cos = (0 until 40).map { i =>
        1.0 - VectorMath.cosineDistance(vec(i * 17L), vec(i * 17L + 9L))
      }
      val m = cos.sum / cos.size
      math.sqrt(cos.map(c => (c - m) * (c - m)).sum / cos.size)
    }
    val manifold = cosSpread(ManifoldCorpus.vector(_))
    val uniform = cosSpread(Fp16Corpus.vector)
    // manifold: cosine tracks a 16-dim latent inner product (~1/sqrt(16)
    // contrast); uniform: 3072 independent components (~1/sqrt(3072))
    assert(manifold > 0.1, s"manifold cosine spread $manifold")
    assert(uniform < 0.05, s"uniform cosine spread $uniform")
    assert(manifold > 4 * uniform)
  }

  test("beam walk recovers true neighbors on manifold data, not uniform") {
    import spark.implicits._
    // n, out-degree, ef, and hops sized so the walk can TOUCH at most
    // ~40% of the graph: a budget where navigation (following gradient)
    // and blind exploration (no gradient) must diverge — at tiny n a
    // generous beam covers everything and both fixtures would pass
    val n = 800
    def recallOn(vec: Long => Array[Float]): Double = {
      val corpus = (0L until n).map(v => (v, vec(v).toSeq))
        .toDF("vec_id", "embedding")
        .localCheckpoint()
      val edges = Knn.knnGraph(corpus, "embedding", "vec_id", topK = 8)
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val qs = Seq(7L, 131L, 263L)
      val rs = qs.map { q =>
        val qv = vec(q)
        val exact = Knn.topK(corpus.filter(col("vec_id") =!= q),
            "embedding", qv, 10, "vec_id")
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        val walked = Knn.graphBeamSearch(corpus, edges, "embedding",
            "vec_id", qv, k = 10, ef = 12, hops = 5, entryId = 0L)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        exact.intersect(walked).size / 10.0
      }
      rs.sum / rs.size
    }
    val manifold = recallOn(ManifoldCorpus.vector(_))
    val uniform = recallOn(Fp16Corpus.vector)
    assert(manifold >= 0.7, s"manifold walk recall $manifold")
    assert(uniform <= 0.5, s"uniform walk recall $uniform")
    assert(manifold > uniform + 0.3,
      s"walk must separate the shapes: manifold=$manifold uniform=$uniform")
  }
}
