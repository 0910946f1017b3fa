#!/bin/sh
# Build the --py-files artifact for spark-submit deployment.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/boilerpipe_coffee_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/boilerpipe_coffee_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as zf:
    for root, _, files in os.walk("boilerpipe_coffee_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                zf.write(p, p)
print("dist/boilerpipe_coffee_spark.zip")
EOF
