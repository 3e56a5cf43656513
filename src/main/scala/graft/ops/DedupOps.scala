package graft.ops
import graft.Q
object DedupOps {
  val queries: Seq[Q] = Seq()
}
