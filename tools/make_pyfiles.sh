#!/usr/bin/env bash
# Package the engine for cluster submission:
#   tools/make_pyfiles.sh && spark-submit --py-files dist/homonim_spark.zip your_job.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/homonim_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/homonim_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("homonim_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/homonim_spark.zip")
EOF
python -c "
import sys; sys.path.insert(0, 'dist/homonim_spark.zip')
import homonim_spark, homonim_spark.operators.fuse
print('zip import OK:', homonim_spark.__version__)
"
