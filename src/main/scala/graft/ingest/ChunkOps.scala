package graft.ingest

import graft.Q

object ChunkOps {
  def queries: Seq[Q] = Seq.empty
}
