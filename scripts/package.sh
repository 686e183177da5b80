#!/bin/sh
# Build the --py-files artifact: dist/sparkcheck.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/sparkcheck.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/sparkcheck.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("sparkcheck/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/sparkcheck.zip")
EOF
unzip -l dist/sparkcheck.zip | tail -3
