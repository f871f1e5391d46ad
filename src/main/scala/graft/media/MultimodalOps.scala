package graft.media

import graft.Q

object MultimodalOps {
  def queries: Seq[Q] = Seq.empty
}
