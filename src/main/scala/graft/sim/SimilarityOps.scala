package graft.sim

import graft.Q

object SimilarityOps {
  def queries: Seq[Q] = Seq.empty
}
