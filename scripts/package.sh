#!/usr/bin/env bash
# Package the engine for cluster submission:
#   scripts/package.sh [out.zip]
#   spark-submit --py-files engine.zip scripts/job.py --events ... --table ... current --drain
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-engine.zip}"
rm -f "$out"
python - "$out" <<'EOF'
import sys, zipfile, pathlib
out = sys.argv[1]
root = pathlib.Path(".")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("arango_etl_spark/**/*.py")):
        z.write(p, p.as_posix())
print(f"wrote {out}")
EOF
