package graft.ops
import graft.Q
object EventOps {
  val queries: Seq[Q] = Seq()
}
