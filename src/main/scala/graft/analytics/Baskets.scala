package graft.analytics

import graft.Q

object Baskets {
  def queries: Seq[Q] = Seq.empty
}
