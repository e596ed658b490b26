#!/bin/bash
# Reliable-checkpoint differential drive (VERDICT r15 #5): run the
# iterative-stage query family end-to-end through graft.Verify twice —
# default localCheckpoint mode and spark.graft.reliableCheckpoint=true
# (Verify auto-sets a temp checkpoint dir) — and hash-compare the two
# parquet dumps. Proves the cluster-grade flag is result-invariant on
# the WHOLE registered family (BFS q250, HITS q270, LPA q222,
# modularity q271, PageRank q130, BM25 q131, k-core q277, clustering
# coef q276, greedy cover q220, and the CC consumers q62/q63/q160/q286),
# not just CheckpointSpec's operator fixtures.
set -eu
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
FAMILY=q62_,q63_,q130_,q131_,q160_,q220_,q222_,q250_,q270_,q271_,q276_,q277_,q286_

SPARK_GRAFT_ONLY=$FAMILY \
  sbt -batch "runMain graft.Verify $SF /root/repo/target/relckpt_base" >/dev/null 2>&1
SPARK_GRAFT_ONLY=$FAMILY SPARK_GRAFT_CONF="spark.graft.reliableCheckpoint=true" \
  sbt -batch "runMain graft.Verify $SF /root/repo/target/relckpt_rel" >/dev/null 2>&1

# the reliable run must have actually checkpointed (rdd-* dirs on disk)
ls -d /tmp/graft-verify-ckpt*/*/rdd-* >/dev/null 2>&1 \
  || { echo "FAIL: reliable run wrote no checkpoint files"; exit 1; }

python3 - <<'EOF'
import duckdb, os, sys, hashlib
base='/root/repo/target/relckpt_base'; rel='/root/repo/target/relckpt_rel'
con = duckdb.connect(); fails = []
for q in sorted(d for d in os.listdir(base) if d.startswith('q')):
    def h(root):
        df = con.execute(
            f"SELECT * FROM read_parquet('{root}/{q}/*.parquet')").fetchdf()
        cols = sorted(df.columns)
        df = df[cols].sort_values(by=cols).reset_index(drop=True)
        return len(df), hashlib.md5(df.to_csv(index=False).encode()).hexdigest()
    nb, hb = h(base); nr, hr = h(rel)
    ok = (nb == nr and hb == hr)
    print(f"{'OK  ' if ok else 'FAIL'} {q} rows {nb}/{nr} "
          f"hash {'match' if hb == hr else 'MISMATCH'}")
    if not ok: fails.append(q)
sys.exit(1 if fails else 0)
EOF
