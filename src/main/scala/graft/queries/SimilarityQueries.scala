package graft.queries
import graft.QDef
object SimilarityQueries { def defs: Seq[QDef] = Seq() }
