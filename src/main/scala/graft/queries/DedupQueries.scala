package graft.queries
import graft.QDef
object DedupQueries { def defs: Seq[QDef] = Seq() }
