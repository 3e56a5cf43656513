package graft.ops
import graft.Q
object SimilarityOps {
  val queries: Seq[Q] = Seq()
}
