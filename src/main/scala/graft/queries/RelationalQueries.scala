package graft.queries
import graft.QDef
object RelationalQueries { def defs: Seq[QDef] = Seq() }
