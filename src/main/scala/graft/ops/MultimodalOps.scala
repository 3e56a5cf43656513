package graft.ops
import graft.Q
object MultimodalOps {
  val queries: Seq[Q] = Seq()
}
