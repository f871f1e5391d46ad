package graft.analytics

import graft.Q

object TimeSeriesOps {
  def queries: Seq[Q] = Seq.empty
}
