package graft.summarize

import graft.Q

object SummarizeOps {
  def queries: Seq[Q] = Seq.empty
}
