#!/bin/bash
# SCALE SOAK, DATA DECADE: the committed soak.sh table proved sf0.001→
# 0.1 is fixture-cost dominated (every exponent < 0.33), so this leg
# builds a synthetic 10× documents/embeddings corpus ABOVE sf0.1
# (graft.SoakData — deterministic, intra-replica duplicate structure)
# and measures the heavy document/embedding gates across that decade:
# exp = log10(t@10x / t@1x). Flag threshold 1.3, same as soak.sh.
#
# Usage: scripts/soak10x.sh [gates-csv]
# NOT part of the per-round gate loop — run in a quiet window.
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=$(sed -n 's/.*OPENS="\(.*\)"/\1/p' scripts/verify_local.sh | head -1)
SOAK=${SOAK_DIR:-target/soak10x}
GATES=${1:-d_exact_dedup,d_minhash_lsh,d_ngram_jaccard,d_simhash,d_neardup_clusters,s_embedding_neardup_blocked,s_semantic_dedup,s_cosine_topk,s_ann_lsh_topk,s_ann_ivf_quantized,x_bm25_batch,x_bm25_topk,x_phash_neardup,x_audio_neardup,x_video_neardup,x_curation_pipeline,x_lang_id,x_quality_gopher,x_text_tokens}

if [ ! -d "$SOAK/documents.parquet" ]; then
  echo "== building 10x corpus under $SOAK ==" >&2
  java $OPENS -Xmx8g -cp "$CP" graft.SoakData /root/testdata/sf0.1 "$SOAK" 10
fi
# the non-scaled tables resolve to sf0.1 via symlink (gates that join
# against events/lineitem keep their fixed side constant — the decade
# applies to the document/embedding axis being measured)
for t in region nation customer supplier part orders lineitem events; do
  [ -e "$SOAK/$t.parquet" ] || ln -s /root/testdata/sf0.1/$t.parquet "$SOAK/$t.parquet"
done

run() { # $1 = sf dir
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_ONLY="$GATES" \
    java $OPENS -Xmx12g -cp "$CP" graft.Bench 2>/dev/null | head -1
}
echo "== sf0.1 (1x) ==" >&2
ONE=$(run /root/testdata/sf0.1)
echo "== $SOAK (10x) ==" >&2
TEN=$(run "$PWD/$SOAK")

python3 - "$GATES" <<EOF
import json, math, sys
gates = sys.argv[1].split(",")
one = json.loads('''$ONE''')
ten = json.loads('''$TEN''')
print("| gate | s@sf0.1 | s@10x | ratio | exp(0.1->1.0) | flag |")
print("|---|---|---|---|---|---|")
for g in sorted(gates):
    t1 = one["queries"].get(g); t10 = ten["queries"].get(g)
    err = g in set(one.get("errors", [])) | set(ten.get("errors", []))
    if err or t1 is None or t10 is None or t1 <= 0 or t10 <= 0:
        print(f"| {g} | - | - | - | - | missing/err |")
        continue
    e = math.log10(t10 / t1)
    flag = "SUPERLINEAR" if e > 1.3 else ""
    print(f"| {g} | {t1:.2f} | {t10:.2f} | {t10/t1:.2f}x | {e:.2f} | {flag} |")
EOF
