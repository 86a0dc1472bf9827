"""Build kr_spark.zip for `spark-submit --py-files` (the north-star launch
shape: spark-submit --py-files kr_spark.zip kr_spark/pipeline/run.py ...).

Usage: python tools/package_pyfiles.py [out.zip]
Zips the kr_spark package (source only, no tests/caches) with archive
paths rooted at kr_spark/ so executors can import it directly.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "kr_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                arc = os.path.relpath(full, REPO)
                z.write(full, arc)
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "kr_spark.zip")
    n = build(out)
    print(f"{out}: {n} modules")
