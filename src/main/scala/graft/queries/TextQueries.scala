package graft.queries
import graft.QDef
object TextQueries { def defs: Seq[QDef] = Seq() }
