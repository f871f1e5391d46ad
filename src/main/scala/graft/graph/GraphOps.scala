package graft.graph

import graft.Q

object GraphOps {
  def queries: Seq[Q] = Seq.empty
}
