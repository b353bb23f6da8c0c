package graft.queries
import graft.QDef
object CepQueries { def defs: Seq[QDef] = Seq() }
