#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/texting_robots_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/texting_robots_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("texting_robots_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
    # conformance fixtures travel with the package so the gate corpus
    # can run cluster-side too
    for root, _dirs, files in os.walk("fixtures/robots"):
        for f in files:
            z.write(os.path.join(root, f))
print("wrote dist/texting_robots_spark.zip")
EOF
