package graft.ops
import graft.Q
object TextOps {
  val queries: Seq[Q] = Seq()
}
