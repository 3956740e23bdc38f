#!/bin/bash
# Dev loop: dump selected queries at a given SF and oracle-check ONLY them.
#   tools/quickcheck.sh <sfDir> <outDir> <comma-separated-names>
set -e
SF=$1; OUT=$2; NAMES=$3
sbt -batch "runMain graft.Verify $SF $OUT $NAMES" 2>&1 | grep -E '\[verify\]|error' || true
python3 - "$OUT" "$NAMES" <<'EOF'
import json, sys
out, names = sys.argv[1], set(sys.argv[2].split(','))
d = json.load(open(f"{out}/oracle_sql.json"))
json.dump({k: v for k, v in d.items() if k in names}, open(f"{out}/oracle_sql.json", "w"))
EOF
python3 tools/check_oracle.py "$SF" "$OUT"
