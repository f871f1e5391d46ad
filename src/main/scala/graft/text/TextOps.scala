package graft.text

import graft.Q

object TextOps {
  def queries: Seq[Q] = Seq.empty
}
