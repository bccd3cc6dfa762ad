#!/usr/bin/env python
"""Build crawler_spark.zip for cluster submission (north_rule launch):

    python package.py
    spark-submit --py-files dist/crawler_spark.zip cli.py --root ... --batches N
"""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> str:
    dist = os.path.join(HERE, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "crawler_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(os.path.join(HERE, "crawler_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, HERE))
    print(out)
    return out


if __name__ == "__main__":
    main()
