#!/bin/bash
# Full-inventory x10 parity sweep (builder tooling, run once per round):
# every declared query executed against the 10x blowup corpus
# (/tmp/graft_scale/x10 — graft.ScaleProbe's deterministic growth of the
# sf0.1 tables) and hash-compared to the DuckDB oracle. The five
# recursive-CTE closure oracles OOM at this scale (BASELINE.md r9) and
# get a rows-only check here — their closures are verified engine-side by
# graft.CcAudit at x10 AND x100 instead.
#
# Usage: tools/x10_sweep.sh [round-tag]   (default tag: rN from git)
# Output: X10_PARITY_<tag>.json at the repo root (committed per round)
# plus the full per-query log at /tmp/x10_sweep_<tag>.log.
set -euo pipefail
cd "$(dirname "$0")/.."
TAG=${1:-r11}
DIR=${SPARK_GRAFT_X10_DIR:-/tmp/graft_scale/x10}
OUT=/tmp/x10_sweep_out_$TAG

if [ ! -d "$DIR/documents.parquet" ] && [ ! -e "$DIR/documents.parquet" ]; then
  echo "x10 dir $DIR missing — generate it first:"
  echo "  sbt 'runMain graft.ScaleProbe ops_entropy'   (generation is cached)"
  exit 2
fi

SKIP="ops_dedup_cc,ops_dedup_keep_best,ops_embed_cluster,ops_phash_cc,ops_cc_audit"

# fresh output dir + hard Verify gate: a crashed Verify must never let
# compare.py bless the PREVIOUS sweep's stale dumps into the artifact
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $DIR $OUT" > /tmp/x10_verify_$TAG.log 2>&1 || {
  echo "Verify FAILED — see /tmp/x10_verify_$TAG.log (no artifact written)"
  grep '\[verify\]' /tmp/x10_verify_$TAG.log || true
  exit 1
}
grep '\[verify\]' /tmp/x10_verify_$TAG.log || true
SKIP_ORACLE=$SKIP COMPARE_JSON_OUT=X10_PARITY_$TAG.json \
  python3 tools/compare.py "$DIR" "$OUT" | tee /tmp/x10_sweep_$TAG.log
echo "artifact: X10_PARITY_$TAG.json"
