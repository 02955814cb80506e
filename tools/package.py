"""Build the spark-submit artifact (north_rule: "ships as spark-submit
--py-files modules"): one zip of the pure-python ``airbyte_spark`` package.

    python tools/package.py [out.zip]
    spark-submit --py-files airbyte_spark.zip -m airbyte_spark.job ...

The package is pure .py (no native deps beyond the cluster's pyspark/
pandas/pyarrow), so the zip is directly importable from executors.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out: str) -> list[str]:
    names = []
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "airbyte_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
                names.append(rel)
    return names


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "airbyte_spark.zip")
    names = build_zip(out)
    print(f"{out}: {len(names)} modules")
